"""TP/EP-sharded DeepSeek serving: token parity vs the single-device engine.

Round-2 queue item (extends VERDICT #2/#7): the DeepSeek engine runs under
shard_map with MLA head-sharded attention, EP-sliced routed experts, and
column/row-sharded shared/dense MLPs (serve/deepseek_tp.py). Runs on the
virtual CPU mesh (conftest); the same path runs on a TPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tensorrt_model_optimizer_tpu.models import deepseek
from tensorrt_model_optimizer_tpu.serve import deepseek_engine as dse


def tp_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), axis_names=("tp",))


@pytest.fixture(scope="module")
def tiny():
    cfg = deepseek.DeepseekConfig.tiny()
    params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 16)))
    return cfg, params, tokens


PRESETS = [
    "INT8_DEFAULT_CFG",   # W8A8: dynamic act amax -> pmax parity path
    "FP8_DEFAULT_CFG",
    "NVFP4_DEFAULT_CFG",  # plane-packed col repack + EP slicing
]


def _engines(tiny, preset, d):
    cfg, params, tokens = tiny
    qm = deepseek.quantize(cfg, params, preset, [tokens])
    cm = dse.compress(qm)
    single = dse.DeepseekEngine(cm, max_seq_len=48)
    tp = dse.DeepseekEngine(cm, max_seq_len=48, mesh=tp_mesh(d))
    return single, tp, tokens


@pytest.mark.parametrize("preset", PRESETS)
def test_tp_generate_token_parity(tiny, preset):
    single, tp, tokens = _engines(tiny, preset, d=2)
    prompt = tokens[:, :8]
    ref = np.asarray(single.generate(prompt, max_new_tokens=6))
    got = np.asarray(tp.generate(prompt, max_new_tokens=6))
    np.testing.assert_array_equal(ref, got)


def test_tp4_ep_parity(tiny):
    """4-way: every device holds exactly ONE routed expert (E=4)."""
    single, tp, tokens = _engines(tiny, "FP8_DEFAULT_CFG", d=4)
    prompt = tokens[:, :8]
    ref = np.asarray(single.generate(prompt, max_new_tokens=5))
    got = np.asarray(tp.generate(prompt, max_new_tokens=5))
    np.testing.assert_array_equal(ref, got)


def test_tp_prefill_logits_close(tiny):
    single, tp, tokens = _engines(tiny, "NVFP4_DEFAULT_CFG", d=2)
    prompt = tokens[:, :8]
    c1 = single.init_cache(prompt.shape[0])
    c2 = tp.init_cache(prompt.shape[0])
    l1, _ = single.prefill(prompt, c1)
    l2, _ = tp.prefill(prompt, c2)
    # psum reorders float accumulation -> allclose, not bit-equal
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-5, atol=2e-5)
