"""DiT diffusion-model quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import dit


@pytest.fixture(scope="module")
def tiny_dit():
    cfg = dit.DiTConfig.tiny()
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    # non-zero final proj + modulation so outputs/conditioning are informative
    # (adaLN-zero init makes t a no-op on a fresh model)
    params["final_proj"] = jax.random.normal(
        jax.random.PRNGKey(1), params["final_proj"].shape, jnp.float32) * 0.05
    params["blocks"]["adaLN.mod"] = jax.random.normal(
        jax.random.PRNGKey(2), params["blocks"]["adaLN.mod"].shape, jnp.float32) * 0.05
    params["final_mod"] = jax.random.normal(
        jax.random.PRNGKey(3), params["final_mod"].shape, jnp.float32) * 0.05
    rng = np.random.default_rng(2)
    batches = [
        (jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32)),
         jnp.asarray(rng.integers(0, 1000, size=(2,)).astype(np.int32)))
        for _ in range(2)
    ]
    return cfg, params, batches


def test_forward_shapes(tiny_dit):
    cfg, params, batches = tiny_dit
    x, t = batches[0]
    eps, _ = dit.forward(cfg, params, x, t)
    assert eps.shape == x.shape
    assert np.all(np.isfinite(np.asarray(eps)))


def test_timestep_conditioning_matters(tiny_dit):
    cfg, params, batches = tiny_dit
    x, t = batches[0]
    e1, _ = dit.forward(cfg, params, x, t)
    e2, _ = dit.forward(cfg, params, x, t + 500)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_patchify_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    p = dit.patchify(x, 4)
    back = dit.unpatchify(p, 16, 4, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("preset", ["INT8_DEFAULT_CFG", "FP8_DEFAULT_CFG", "NVFP4_DEFAULT_CFG"])
def test_dit_ptq(tiny_dit, preset):
    cfg, params, batches = tiny_dit
    layout, qstate = dit.quantize_dit(cfg, params, preset, batches)
    x, t = batches[0]
    ref, _ = dit.forward(cfg, params, x, t)
    out, _ = dit.forward(cfg, params, x, t, layout=layout, qstate=qstate)
    assert np.all(np.isfinite(np.asarray(out)))
    a, b = np.asarray(ref).ravel(), np.asarray(out).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, f"{preset}: {corr}"
    # amax collected on blocks
    assert np.all(np.asarray(qstate["attn.qkv"]["weight"].amax) > 0)


@pytest.mark.parametrize("preset", ["INT8_DEFAULT_CFG", "FP8_DEFAULT_CFG"])
def test_dit_real_quant_serving(tiny_dit, preset):
    """compress_dit + forward_packed (real-quant denoise step through the
    engine's quantized matmuls) tracks the fake-quant forward — the
    diffusion-deployment path (reference `benchmark.md:47-51`)."""
    cfg, params, batches = tiny_dit
    layout, qstate = dit.quantize_dit(cfg, params, preset, batches)
    kinds, packed = dit.compress_dit(cfg, params, layout, qstate)
    x, t = batches[0]
    ref, _ = dit.forward(cfg, params, x, t, layout=layout, qstate=qstate)
    out = dit.forward_packed(cfg, params, kinds, packed, x, t,
                             layout=layout, qstate=qstate, backend="xla")
    a, b = np.asarray(ref).ravel(), np.asarray(out).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, f"{preset}: {corr}"
