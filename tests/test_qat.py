"""QAT trainer tests: SGD step, optax trainer, LSQ amax training, sparse QAT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.quant import get_preset, qat
from tensorrt_model_optimizer_tpu.quant.config import make_config


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    return cfg, params, tokens


def _calibrated(cfg, params, tokens, preset):
    layout = llama.build_layout(cfg, get_preset(preset) if isinstance(preset, str) else preset)
    qs = llama.init_quant_state(cfg, layout)
    _, qs, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
    return layout, qs


def test_sgd_qat_reduces_loss(tiny):
    cfg, params, tokens = tiny
    layout, qs = _calibrated(cfg, params, tokens, "FP8_DEFAULT_CFG")
    step = jax.jit(qat.make_train_step(cfg, layout, lr=5e-2))
    p, l0 = step(params, qs, tokens)
    for _ in range(5):
        p, l = step(p, qs, tokens)
    assert float(l) < float(l0)


def test_optax_qat(tiny):
    cfg, params, tokens = tiny
    layout, qs = _calibrated(cfg, params, tokens, "INT8_DEFAULT_CFG")
    step, init = qat.make_optax_train_step(cfg, layout)
    opt_state = init(params, qs)
    jstep = jax.jit(step)
    p, qs2, opt_state, l0 = jstep(params, qs, opt_state, tokens)
    for _ in range(5):
        p, qs2, opt_state, l = jstep(p, qs2, opt_state, tokens)
    assert float(l) < float(l0)


def test_lsq_amax_training(tiny):
    cfg, params, tokens = tiny
    lsq_cfg = make_config({
        "*weight_quantizer": {"num_bits": 4, "learn_amax": True},
        "*input_quantizer": {"enable": False},
        "*lm_head*": {"enable": False},
    })
    layout, qs = _calibrated(cfg, params, tokens, lsq_cfg)
    amax0 = np.asarray(qs["mlp.down_proj"]["weight"].amax).copy()
    step, init = qat.make_optax_train_step(cfg, layout, train_amax=True)
    opt_state = init(params, qs)
    jstep = jax.jit(step)
    p, qs, opt_state, _ = jstep(params, qs, opt_state, tokens)
    for _ in range(3):
        p, qs, opt_state, _ = jstep(p, qs, opt_state, tokens)
    amax1 = np.asarray(qs["mlp.down_proj"]["weight"].amax)
    assert not np.allclose(amax0, amax1)  # amax moved via LSQ grads


def test_sparse_qat_preserves_masks(tiny):
    from tensorrt_model_optimizer_tpu.sparsity import magnitude, sparsify

    cfg, params, tokens = tiny
    sp_params, masks = sparsify.sparsify(cfg, params, "magnitude")
    layout, qs = _calibrated(cfg, sp_params, tokens, "FP8_DEFAULT_CFG")
    step, init = qat.make_optax_train_step(cfg, layout, masks=masks)
    opt_state = init(sp_params, qs)
    jstep = jax.jit(step)
    p, _, opt_state, _ = jstep(sp_params, qs, opt_state, tokens)
    w = np.asarray(p["layers"]["mlp.gate_proj"])
    m = np.asarray(masks["mlp.gate_proj"])
    assert np.all(w[~m] == 0)


def test_moe_family_qat_step_reduces_loss():
    """QAT over a registry family forward (mixtral): loss decreases."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.models import mixtral
    from tensorrt_model_optimizer_tpu.quant import get_preset, qat

    cfg = mixtral.MixtralConfig.tiny(capacity_factor=4.0)
    params = mixtral.init_params(cfg, jax.random.PRNGKey(30))
    layout = mixtral.build_layout(cfg, get_preset("FP8_DEFAULT_CFG"))
    qs = mixtral.init_quant_state(cfg, layout)
    toks = jnp.asarray(np.random.default_rng(30).integers(0, 256, (4, 17)))
    _, qs = mixtral.forward(cfg, params, toks[:, :-1], layout=layout, qstate=qs, calib=True)
    step, init = qat.make_optax_train_step(cfg, layout, forward_fn=mixtral.forward)
    opt = init(params, qs)
    step = jax.jit(step)
    losses = []
    for _ in range(8):
        params, qs, opt, loss = step(params, qs, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
