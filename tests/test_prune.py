"""Minitron-style pruning tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.prune import minitron


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


def test_importance_shapes(tiny):
    cfg, params, batches = tiny
    sc = minitron.importance(cfg, params, batches, capture_tokens=16)
    assert sc.kv_group.shape == (2, 2)
    assert sc.ffn.shape == (2, 128)
    assert sc.hidden.shape == (64,)
    assert sc.layer.shape == (2,)
    assert np.all(sc.ffn >= 0)


def test_width_prune_runs(tiny):
    cfg, params, batches = tiny
    sc = minitron.importance(cfg, params, batches, capture_tokens=16)
    new_cfg, new_params, plan = minitron.prune(
        cfg, params, sc, num_kv_heads=1, intermediate_size=64, hidden_size=48)
    assert new_cfg.num_attention_heads == 2
    assert new_cfg.intermediate_size == 64
    assert new_cfg.hidden_size == 48
    assert new_params["layers"]["mlp.gate_proj"].shape == (2, 64, 48)
    logits, _, _ = llama.forward(new_cfg, new_params, batches[0])
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_depth_prune_runs(tiny):
    cfg, params, batches = tiny
    sc = minitron.importance(cfg, params, batches, capture_tokens=16)
    new_cfg, new_params, plan = minitron.prune(cfg, params, sc, num_layers=1)
    assert new_cfg.num_hidden_layers == 1
    logits, _, _ = llama.forward(new_cfg, new_params, batches[0])
    assert np.all(np.isfinite(np.asarray(logits)))


def test_pruned_quantizes(tiny):
    from tensorrt_model_optimizer_tpu.quant import ptq

    cfg, params, batches = tiny
    sc = minitron.importance(cfg, params, batches, capture_tokens=16)
    new_cfg, new_params, _ = minitron.prune(cfg, params, sc, intermediate_size=64)
    model = ptq.quantize(new_cfg, new_params, "FP8_DEFAULT_CFG", batches)
    logits, _, _ = model.forward(batches[0])
    assert np.all(np.isfinite(np.asarray(logits)))
