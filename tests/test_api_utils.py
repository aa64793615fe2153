"""mtq-style API façade + perf utils tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.quant import api
from tensorrt_model_optimizer_tpu.utils import perf


@pytest.fixture(scope="module")
def model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return api.quantize(cfg, params, "INT8_DEFAULT_CFG", batches), batches


def test_fold_weight_preserves_forward(model):
    m, batches = model
    ref, _, _ = m.forward(batches[0])
    folded = api.fold_weight(m)
    assert not folded.layout.get("mlp.down_proj.weight").enable
    out, _, _ = folded.forward(batches[0])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4)


def test_disable_quantizer(model):
    m, batches = model
    m2 = api.disable_quantizer(m, "*input")
    assert not m2.layout.get("mlp.up_proj.input").enable
    assert m2.layout.get("mlp.up_proj.weight").enable


def test_quantization_mse(model):
    m, _ = model
    mse = api.compute_quantization_mse(m)
    assert set(mse) == set(llama.PROJ_NAMES)
    assert all(v > 0 for v in mse.values())


def test_timer_and_tree_bytes(model):
    m, batches = model
    t = perf.Timer()
    with t.time("fwd"):
        out, _, _ = m.forward(batches[0])
    assert "fwd" in t.report()
    assert perf.tree_bytes(m.params) > 0
    stats = perf.device_memory_stats()
    assert isinstance(stats, dict)
