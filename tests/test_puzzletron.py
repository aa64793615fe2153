"""Puzzletron-lite tests: library, MIP assembly, stitched model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.puzzletron import puzzle


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(num_hidden_layers=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


def test_library_built_and_scored(setup):
    cfg, params, batches = setup
    lib = puzzle.build_and_score_library(cfg, params, batches)
    assert len(lib) == 4
    names = {c.name for c in lib[0]}
    assert {"full", "ffn50", "kv50", "noop", "ffn25", "ffn75",
            "kv25", "ffn50+kv50", "attn_skip", "mlp_skip"} <= names
    full = next(c for c in lib[0] if c.name == "full")
    assert full.score == pytest.approx(0.0, abs=1e-9)  # full layer == itself
    noop = next(c for c in lib[0] if c.name == "noop")
    assert noop.score > 0 and noop.cost == 0


def test_mip_respects_budget(setup):
    cfg, params, batches = setup
    lib = puzzle.build_and_score_library(cfg, params, batches)
    res = puzzle.run_puzzle(lib, param_budget_ratio=0.6)
    assert res.total_params <= 0.6 * res.full_params + 1
    assert len(res.choices) == 4
    # tight budget forces at least one non-full choice
    assert any(c != "full" for c in res.choices)


def test_stitched_model_runs(setup):
    cfg, params, batches = setup
    lib = puzzle.build_and_score_library(cfg, params, batches)
    res = puzzle.run_puzzle(lib, param_budget_ratio=0.7)
    logits = puzzle.forward_hetero(cfg, params, res, batches[0])
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))
    # generous budget keeps everything full == exact match with base model
    res_full = puzzle.run_puzzle(lib, param_budget_ratio=1.0)
    assert all(c == "full" for c in res_full.choices)
    ref, _, _ = llama.forward(cfg, params, batches[0])
    out_full = puzzle.forward_hetero(cfg, params, res_full, batches[0])
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_skip_candidates_semantics(setup):
    """attn_skip output must equal x + mlp(norm2(x)) exactly."""
    cfg, params, batches = setup
    lib = puzzle.build_and_score_library(cfg, params, batches,
                                         kinds=("full", "attn_skip", "mlp_skip"))
    for cands in lib:
        by = {c.name: c for c in cands}
        assert by["attn_skip"].cost < by["full"].cost
        assert by["mlp_skip"].cost < by["full"].cost
        assert by["attn_skip"].skip == "attn"
    # a puzzle picking skips still runs end to end
    res = puzzle.run_puzzle(lib, param_budget_ratio=0.7)
    logits = puzzle.forward_hetero(cfg, params, res, batches[0][:, :8])
    assert np.isfinite(np.asarray(logits)).all()
    assert any(c in ("attn_skip", "mlp_skip", "noop") for c in res.choices)


@pytest.fixture(scope="module")
def scored_library(setup):
    cfg, params, batches = setup
    return puzzle.build_and_score_library(cfg, params, batches)


class TestSubblockStats:
    """Cost models (reference subblock_stats/: params+memory+runtime)."""

    def test_stats_scale_with_candidate(self, scored_library):
        from tensorrt_model_optimizer_tpu.puzzletron.puzzle import subblock_stats

        lib = scored_library
        full = next(c for c in lib[0] if c.name == "full")
        noop = next(c for c in lib[0] if c.name == "noop")
        s_full = subblock_stats(full, batch=2, seq_len=512)
        s_noop = subblock_stats(noop)
        assert s_full.params > 0 and s_full.memory_mib > 0
        assert s_full.decode_ms > 0 and s_full.prefill_ms > 0
        assert s_noop.memory_mib == 0 and s_noop.decode_ms == 0
        # kv cache grows with batch
        s_b8 = subblock_stats(full, batch=8, seq_len=512)
        assert s_b8.kv_cache_mib > s_full.kv_cache_mib
        # an ffn-pruned candidate costs less
        pruned = next((c for c in lib[0] if "ffn" in c.name), None)
        if pruned is not None:
            sp = subblock_stats(pruned, batch=2, seq_len=512)
            assert sp.weights_mib < s_full.weights_mib
        # attn-skipped candidate has no kv cache
        askip = next((c for c in lib[0] if c.skip == "attn"), None)
        if askip is not None:
            assert subblock_stats(askip).kv_cache_mib == 0

    def test_memory_constrained_puzzle(self, scored_library):
        from tensorrt_model_optimizer_tpu.puzzletron.puzzle import (
            run_puzzle_constrained, subblock_stats)

        lib = scored_library
        full_mem = sum(
            subblock_stats(next(c for c in cands if c.name == "full")).memory_mib
            for cands in lib
        )
        res = run_puzzle_constrained(lib, memory_budget_mib=0.6 * full_mem)
        got_mem = sum(subblock_stats(c).memory_mib for c in res.layers)
        assert got_mem <= 0.6 * full_mem + 1e-6
        assert any(n != "full" for n in res.choices)

    def test_latency_constrained_puzzle(self, scored_library):
        from tensorrt_model_optimizer_tpu.puzzletron.puzzle import (
            run_puzzle_constrained, subblock_stats)

        lib = scored_library
        full_ms = sum(
            subblock_stats(next(c for c in cands if c.name == "full")).decode_ms
            for cands in lib
        )
        res = run_puzzle_constrained(lib, decode_budget_ms=0.5 * full_ms)
        got = sum(subblock_stats(c).decode_ms for c in res.layers)
        assert got <= 0.5 * full_ms + 1e-9


def test_sewing_kit_roundtrip(setup, tmp_path):
    """save_child -> load_child reproduces the stitched model bit-for-bit."""
    cfg, params, batches = setup
    lib = puzzle.build_and_score_library(cfg, params, batches)
    res = puzzle.run_puzzle(lib, param_budget_ratio=0.7)
    ref = puzzle.forward_hetero(cfg, params, res, batches[0])

    path = str(tmp_path / "child")
    puzzle.save_child(path, cfg, params, res)
    cfg2, params2, res2 = puzzle.load_child(path)
    assert res2.choices == res.choices
    assert [c.skip for c in res2.layers] == [c.skip for c in res.layers]
    got = puzzle.forward_hetero(cfg2, params2, res2, batches[0])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mamba_replacement_and_healing():
    """Round-5 depth: alternative-architecture replacement (attention ->
    locally-distilled mamba mixer, reference anymodel) + post-stitch KD
    healing (reference post-stitch distillation)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.puzzletron import puzzle

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    lib = puzzle.build_and_score_library(
        cfg, params, batches,
        kinds=("full", "ffn50", "attn2mamba", "noop"))
    names = {c.name for cands in lib for c in cands}
    assert "attn2mamba" in names
    m = next(c for c in lib[0] if c.name == "attn2mamba")
    assert m.skip == "mamba" and m.mamba_cfg is not None
    assert np.isfinite(m.score)
    # force a mamba layer into the stitched child and heal it
    res = puzzle.run_puzzle(lib, param_budget_ratio=0.9)
    forced = list(res.layers)
    forced[0] = m
    res = dataclasses.replace(res, layers=forced,
                              choices=[c.name for c in forced])
    lg = puzzle.forward_hetero(cfg, params, res, batches[0])
    assert np.all(np.isfinite(np.asarray(lg)))
    healed, metrics = puzzle.heal_child(cfg, params, res, batches, steps=8)
    assert metrics["kd_loss_last"] <= metrics["kd_loss_first"] + 1e-3, metrics
    lg2 = puzzle.forward_hetero(cfg, params, healed, batches[0])
    assert np.all(np.isfinite(np.asarray(lg2)))
