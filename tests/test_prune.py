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


class TestMinitronExpertPruning:
    """Minitron `num_moe_experts` pruning (mcore_minitron.py:110 analog)."""

    def _setup(self):
        from tensorrt_model_optimizer_tpu.models import mixtral

        cfg = mixtral.MixtralConfig.tiny(num_experts=4, top_k=2,
                                         capacity_factor=4.0)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(50))
        rng = np.random.default_rng(50)
        batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
        return cfg, params, batches

    def test_dead_expert_is_pruned_first(self):
        from tensorrt_model_optimizer_tpu.models import mixtral
        from tensorrt_model_optimizer_tpu.prune import minitron_moe

        import dataclasses as _dc

        cfg, params, batches = self._setup()
        # make expert 2 unroutable via a large negative router bias
        cfg = _dc.replace(cfg, router_bias=True)
        layers = dict(params["layers"])
        bias = np.zeros((cfg.num_hidden_layers, cfg.num_experts), np.float32)
        bias[:, 2] = -1e4
        layers["moe.router__bias"] = jnp.asarray(bias)
        params = {**params, "layers": layers}
        scores = minitron_moe.expert_importance(cfg, params, batches)
        assert scores.shape == (cfg.num_hidden_layers, cfg.num_experts)
        assert np.all(np.argmin(np.asarray(scores), axis=1) == 2)
        new_cfg, new_params = minitron_moe.prune_experts(cfg, params, 3, scores)
        assert new_cfg.num_experts == 3
        assert new_params["layers"]["moe.gate_proj"].shape[1] == 3
        logits, _ = mixtral.forward(new_cfg, new_params, batches[0])
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_keep_all_is_identity(self):
        from tensorrt_model_optimizer_tpu.models import mixtral
        from tensorrt_model_optimizer_tpu.prune import minitron_moe

        cfg, params, batches = self._setup()
        ref, _ = mixtral.forward(cfg, params, batches[0])
        new_cfg, new_params = minitron_moe.prune_moe(
            cfg, params, batches, keep=cfg.num_experts)
        out, _ = mixtral.forward(new_cfg, new_params, batches[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_pruned_model_tracks_full_better_than_worst(self):
        """Keeping the top experts tracks the full model better than
        keeping the bottom experts."""
        from tensorrt_model_optimizer_tpu.models import mixtral
        from tensorrt_model_optimizer_tpu.prune import minitron_moe

        cfg, params, batches = self._setup()
        ref, _ = mixtral.forward(cfg, params, batches[0])
        scores = minitron_moe.expert_importance(cfg, params, batches)
        best_cfg, best_p = minitron_moe.prune_experts(cfg, params, 2, scores)
        worst_cfg, worst_p = minitron_moe.prune_experts(cfg, params, 2, -scores)
        lb, _ = mixtral.forward(best_cfg, best_p, batches[0])
        lw, _ = mixtral.forward(worst_cfg, worst_p, batches[0])
        r = np.asarray(ref).ravel()
        cb = np.corrcoef(np.asarray(lb).ravel(), r)[0, 1]
        cw = np.corrcoef(np.asarray(lw).ravel(), r)[0, 1]
        assert cb > cw, (cb, cw)
