"""AutoQuantize tests: scores, ILP selection, budget satisfaction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.quant import auto


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


def test_ilp_onehot_and_budget():
    scores = np.array([[10.0, 1.0], [10.0, 1.0], [10.0, 1.0]])
    costs = np.array([[1.0, 4.0]] * 3)
    pick = auto._solve_ilp(scores, costs, budget=9.0)
    # budget lets exactly two rows take the expensive low-score option
    assert costs[np.arange(3), pick].sum() <= 9.0
    assert (pick == 1).sum() == 2


def test_auto_quantize_end_to_end(tiny):
    cfg, params, batches = tiny
    res = auto.auto_quantize(
        cfg, params,
        candidates=["INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "FP8_DEFAULT_CFG"],
        calib_batches=batches,
        effective_bits=6.0,
        capture_tokens=16,
    )
    assert len(res.layer_layouts) == cfg.num_hidden_layers
    assert res.effective_bits <= 6.0 + 1e-6
    assert res.scores.shape[1] == 2
    # mixed-precision model runs with the calibrated state from the search
    logits, _ = llama.forward_unrolled(
        cfg, params, batches[0], res.layer_layouts, res.qstate_list)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_tighter_budget_prefers_cheap_format(tiny):
    cfg, params, batches = tiny
    res4 = auto.auto_quantize(
        cfg, params, ["INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "FP8_DEFAULT_CFG"],
        batches, effective_bits=4.2, capture_tokens=16)
    res8 = auto.auto_quantize(
        cfg, params, ["INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "FP8_DEFAULT_CFG"],
        batches, effective_bits=8.0, capture_tokens=16)
    n4 = sum(v == 0 for c in res4.choice for v in c.values())
    n8 = sum(v == 0 for c in res8.choice for v in c.values())
    assert n4 >= n8  # tighter budget -> more int4 groups


def test_kl_div_scoring(tiny):
    cfg, params, batches = tiny
    res = auto.auto_quantize(
        cfg, params, ["INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "FP8_DEFAULT_CFG"],
        batches, effective_bits=6.0, capture_tokens=16, score_method="kl_div")
    assert res.effective_bits <= 6.0 + 1e-6
    logits, _ = llama.forward_unrolled(
        cfg, params, batches[0], res.layer_layouts, res.qstate_list)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_mixed_precision_decode_with_cache(tiny):
    """AutoQuantize result decodes incrementally == full-context forward."""
    cfg, params, batches = tiny
    res = auto.auto_quantize(
        cfg, params, ["INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "FP8_DEFAULT_CFG"],
        batches, effective_bits=6.0, capture_tokens=16)
    tokens = batches[0]
    full, _ = llama.forward_unrolled(
        cfg, params, tokens, res.layer_layouts, res.qstate_list)
    cache = llama.init_cache(cfg, batch=tokens.shape[0], max_len=32)
    logits, _, cache = llama.forward_unrolled(
        cfg, params, tokens[:, :12], res.layer_layouts, res.qstate_list,
        cache=cache)
    np.testing.assert_allclose(
        np.asarray(full[:, 11]), np.asarray(logits[:, -1]), rtol=2e-3, atol=2e-3)
    logits, _, cache = llama.forward_unrolled(
        cfg, params, tokens[:, 12:13], res.layer_layouts, res.qstate_list,
        cache=cache)
    np.testing.assert_allclose(
        np.asarray(full[:, 12]), np.asarray(logits[:, 0]), rtol=2e-3, atol=2e-3)


class TestAutoQuantizeMoE:
    def test_active_moe_costing(self):
        """Expert cost counts at top_k/num_experts; budget respected."""
        from tensorrt_model_optimizer_tpu.models import mixtral
        from tensorrt_model_optimizer_tpu.quant import auto

        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        batches = [jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))]
        res = auto.auto_quantize_moe(
            cfg, params, ["NVFP4_DEFAULT_CFG", "FP8_DEFAULT_CFG"], batches,
            effective_bits=6.0, capture_tokens=16,
        )
        assert res.expert_cost_ratio == cfg.top_k / cfg.num_experts
        assert res.effective_bits <= 6.0 + 1e-6
        assert len(res.layer_layouts) == cfg.num_hidden_layers
        # chosen layouts must resolve real quantizer configs for expert sites
        wcfg = res.layer_layouts[0].get("moe.down_proj.weight")
        assert wcfg.enable

    def test_tight_budget_prefers_low_bits(self):
        from tensorrt_model_optimizer_tpu.models import mixtral
        from tensorrt_model_optimizer_tpu.quant import auto

        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        batches = [jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 16)))]
        res = auto.auto_quantize_moe(
            cfg, params, ["NVFP4_DEFAULT_CFG", "FP8_DEFAULT_CFG"], batches,
            effective_bits=4.6, capture_tokens=16,
        )
        # at 4.6 effective bits nearly everything must pick the 4-bit format
        n_fp8 = sum(1 for c in res.choice for v in c.values() if v == 1)
        assert res.effective_bits <= 4.6 + 1e-6
        assert n_fp8 <= cfg.num_hidden_layers  # at most half the rows stay fp8

    def test_capture_shapes(self):
        from tensorrt_model_optimizer_tpu.models import mixtral

        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        toks = jnp.asarray(np.random.default_rng(2).integers(0, 256, (2, 16)))
        logits, _, caps = mixtral.forward(cfg, params, toks, capture_tokens=8)
        assert caps["attn_in"].shape == (cfg.num_hidden_layers, 8, cfg.hidden_size)
        assert caps["moe_in"].shape == (cfg.num_hidden_layers, 8, cfg.hidden_size)

    def test_moe_mixed_forward(self):
        """auto_quantize_moe layouts run through the unrolled MoE forward:
        calibrate per layer, then mixed fake-quant inference tracks bf16."""
        from tensorrt_model_optimizer_tpu.models import mixtral
        from tensorrt_model_optimizer_tpu.quant import auto

        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        toks = jnp.asarray(np.random.default_rng(3).integers(0, 256, (2, 16)))
        res = auto.auto_quantize_moe(
            cfg, params, ["NVFP4_DEFAULT_CFG", "FP8_DEFAULT_CFG"], [toks],
            effective_bits=6.0, capture_tokens=16,
        )
        _, states = mixtral.forward_unrolled(
            cfg, params, toks, res.layer_layouts, calib=True)
        logits, _ = mixtral.forward_unrolled(
            cfg, params, toks, res.layer_layouts, qstate_list=states)
        ref, _ = mixtral.forward(cfg, params, toks)
        corr = np.corrcoef(np.asarray(logits).ravel(), np.asarray(ref).ravel())[0, 1]
        assert corr > 0.95, corr


def test_auto_quantize_checkpoint_resume(tmp_path):
    """Second call with the same checkpoint skips scoring and matches."""
    import time

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    batches = [jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))]
    ckpt = str(tmp_path / "aq_scores.npz")
    from tensorrt_model_optimizer_tpu.quant import auto

    r1 = auto.auto_quantize(cfg, params, ["NVFP4_DEFAULT_CFG", "FP8_DEFAULT_CFG"],
                            batches, effective_bits=6.0, capture_tokens=16,
                            checkpoint_path=ckpt)
    assert (tmp_path / "aq_scores.npz").exists()
    r2 = auto.auto_quantize(cfg, params, ["NVFP4_DEFAULT_CFG", "FP8_DEFAULT_CFG"],
                            batches, effective_bits=6.0, capture_tokens=16,
                            checkpoint_path=ckpt)
    assert r1.choice == r2.choice
    assert abs(r1.effective_bits - r2.effective_bits) < 1e-9
    # a different budget re-solves from the same checkpoint
    r3 = auto.auto_quantize(cfg, params, ["NVFP4_DEFAULT_CFG", "FP8_DEFAULT_CFG"],
                            batches, effective_bits=4.6, capture_tokens=16,
                            checkpoint_path=ckpt)
    assert r3.effective_bits <= 4.6 + 1e-6


def test_validation_and_utils():
    from tensorrt_model_optimizer_tpu.quant import quantizer as Q
    from tensorrt_model_optimizer_tpu.utils import logging as L
    from tensorrt_model_optimizer_tpu.utils import memory as M

    good = Q.QuantizerState(amax=jnp.asarray(1.0))
    bad = Q.QuantizerState(amax=jnp.asarray(float("nan")))
    assert Q.validate_state(good, "x") == []
    assert any("NaN" in p for p in Q.validate_state(bad, "x"))
    probs = Q.validate_qstate({"site": {"weight": bad, "input": good}})
    assert len(probs) == 1 and "site.weight" in probs[0]
    L.print_rank_0("rank0 print ok")
    L.atomic_print("atomic ok")
    s = M.memory_summary()
    assert isinstance(s, str)
    with M.MemoryMonitor() as mm:
        _ = jnp.ones((128, 128)) @ jnp.ones((128, 128))
    assert mm.end is not None


def test_auto_quantize_moe_gpt_oss():
    """AutoQuantize's active-expert costing runs on the GPT-OSS family
    through the shared forward signature."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.models import gpt_oss
    from tensorrt_model_optimizer_tpu.quant import auto

    cfg = gpt_oss.GptOssConfig.tiny(capacity_factor=4.0)
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(31))
    toks = jnp.asarray(np.random.default_rng(31).integers(0, 256, (2, 16)))
    res = auto.auto_quantize_moe(
        cfg, params, ["NVFP4_DEFAULT_CFG", "FP8_DEFAULT_CFG"], [toks],
        effective_bits=6.0, forward_fn=gpt_oss.forward,
    )
    assert res.effective_bits <= 6.0 + 1e-6
    assert len(res.layer_layouts) == cfg.num_hidden_layers
