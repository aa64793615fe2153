"""Pipeline parallelism tests: staged forward == plain forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.parallel import pipeline
from tensorrt_model_optimizer_tpu.quant import get_preset


@pytest.fixture(scope="module")
def model8():
    # 8 layers over 4 pipeline stages
    cfg = llama.LlamaConfig.tiny(num_hidden_layers=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 256, size=(4, 16)))
    return cfg, params, tokens


def test_pipeline_matches_plain(model8):
    cfg, params, tokens = model8
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, axis_names=("pipe",))
    ref, _, _ = llama.forward(cfg, params, tokens)
    out = pipeline.pipeline_forward(cfg, params, tokens, mesh, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_in_jit(model8):
    cfg, params, tokens = model8
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, axis_names=("pipe",))
    f = jax.jit(lambda p, t: pipeline.pipeline_forward(cfg, p, t, mesh, num_microbatches=2))
    out = f(params, tokens)
    ref, _, _ = llama.forward(cfg, params, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_quantized_pipeline(model8):
    cfg, params, tokens = model8
    layout = llama.build_layout(cfg, get_preset("FP8_DEFAULT_CFG"))
    qs = llama.init_quant_state(cfg, layout)
    _, qs, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, axis_names=("pipe",))
    ref, _, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs)
    out = pipeline.pipeline_forward(
        cfg, params, tokens, mesh, num_microbatches=4, layout=layout, qstate=qs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
