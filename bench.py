#!/usr/bin/env python
"""Decode-throughput benchmark: quantized Llama-3.1-8B serving on one chip.

Measures greedy decode tokens/s of the real-quant engine (packed weights +
fused Pallas dequant-matmul kernels) using the fused single-dispatch decode
step (`Engine.decode_step`: on-device argmax + donated KV cache — the
round-2 ablation measured the old two-dispatch/no-donation step at 10-20x
this cost). Weights are synthesized directly in packed form — throughput is
independent of weight values, and this avoids materializing 16 GB of bf16.

`vs_baseline` is judged against THIS REPO'S OWN bf16 in the SAME session,
chip-normalized the way the reference normalizes its 70B rows
(`examples/benchmark.md:11-14,26-28`: "speedup normalized to GPU count",
BF16 base TP2): bf16 Llama3.1-8B + KV cache does not fit one 16 GB chip
(measured OOM: 15.96 GB needed vs 15.75 available), so serving it takes two
chips (TP2). The bf16 anchor is therefore the measured bf16 half-model
(L=16) step — the per-chip work of an ideally-scaling TP2 deployment —
normalized by its 2 chips:

    vs_baseline = fmt_tok_s(L32, 1 chip) / (bf16_tok_s(L16) / 2)

The raw same-shape ratio fmt(L16)/bf16(L16) is also reported (`raw_ratio`).

Prints exactly ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# Default = int4: the BASELINE.json north-star metric (4-bit decode vs
# chip-normalized bf16). r04 same-session A/B with the bd3/TO512/TK4096
# schedule: int4 1.713x (481.6 tok/s/chip) vs fp8 1.688x (r03), nvfp4-word2
# 1.157x, int8 1.794x (r02). Override with BENCH_FORMAT.
FORMAT = os.environ.get("BENCH_FORMAT", "int4")
BATCH = int(os.environ.get("BENCH_BS", "8"))
# r5 default = the REFERENCE SCENARIO (2048-in / 128-out decode,
# benchmark.md:11-14): the r4 headline was the prefill-128 short-context
# number and VERDICT r4 #1 asked for the 2048-in claim. At >=1024-token
# prefill the KV cache defaults to int8 on BOTH engines (equalized-KV
# ratio; bf16 KV at 2048 is memory-marginal beside the anchor) and the
# packed-KV attention kernel is on (best measured int8-KV path at 2048:
# 14.66 vs 15.58 ms, r5 chain1b). Explicit BENCH_KV/BENCH_KVK override;
# BENCH_KV=none forces the bf16 cache.
PREFILL = int(os.environ.get("BENCH_PREFILL", "2048"))
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
# +512: covers the default 5 rounds x 64 steps of decode budget AND
# keeps MAXLEN a multiple of 512 so the kv-attention kernel gets
# full-size S blocks (2304-style maxlens fall to 128-row blocks)
MAXLEN = int(os.environ.get("BENCH_MAXLEN", str(PREFILL + 512)))
# Max dispatches in flight before a value barrier. Donation is deferred on
# the relay (buffers reclaim at execution, not dispatch), so every queued
# step pins a fresh KV-cache allocation; an unbounded queue OOMed the chip
# with the bf16 anchor resident (RESOURCE_EXHAUSTED on the first timed
# block, 2026-08-17). Depth 2 keeps dispatch/compute overlap while capping
# transient cache copies at ~2x.
SYNC_EVERY = int(os.environ.get("BENCH_SYNC_EVERY", "2"))

# Reference's published H200 numbers (examples/benchmark.md:23-25), kept as
# cross-hardware CONTEXT only — not the judged baseline.
H200_BS8 = {"int4": 599.7, "nvfp4": 599.7, "fp8": 1051.2, "int8": 1051.2,
            "w8a8": 1051.2, "bf16": 803.1}


def synth_packed_layers(cfg, fmt, rng):
    """Packed projection weights, directly in serving layout.

    Generated ON DEVICE (jax.random bits + bitcasts inside jit): a host
    synth of the 8B uploads 4-8 GB through the relay, which stalls for tens
    of minutes in slow pool windows (observed 2026-08-17). Throughput is
    value-independent, so random bit patterns in each format's valid range
    are equivalent — and the upload disappears entirely.
    """
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import llama

    L = cfg.num_hidden_layers
    shapes = llama._layer_shapes(cfg)
    layers = {
        "input_layernorm": jnp.ones((L, cfg.hidden_size), cfg.dtype),
        "post_attention_layernorm": jnp.ones((L, cfg.hidden_size), cfg.dtype),
    }
    kinds = {}

    def u8(key, O, K, lo, hi):
        r = jax.jit(
            lambda k: jax.random.randint(k, (L, O, K), lo, hi, jnp.int32)
            .astype(jnp.uint8)
        )(key)
        return r

    key = jax.random.PRNGKey(int(rng.integers(1 << 30)))
    for idx, name in enumerate(llama.PROJ_NAMES):
        O, K = shapes[name]
        k_i = jax.random.fold_in(key, idx)
        if fmt == "int4":
            bsz = 128
            layers[name] = {
                "packed": u8(k_i, O // 2, K, 0, 256),
                "scale_lo": jnp.full((L, O // 2, K // bsz), 0.01, jnp.float32),
                "scale_hi": jnp.full((L, O // 2, K // bsz), 0.01, jnp.float32),
            }
            kinds[name] = "int4"
        elif fmt == "nvfp4":
            bsz = 16
            layers[name] = {
                "packed": u8(k_i, O // 2, K, 0, 256),
                "scale_lo": jnp.full((L, O // 2, K // bsz), 1.0, jnp.float8_e4m3fn),
                "scale_hi": jnp.full((L, O // 2, K // bsz), 1.0, jnp.float8_e4m3fn),
                "global_scale": jnp.full((L,), 0.01, jnp.float32),
            }
            kinds[name] = "nvfp4"
        elif fmt in ("int8", "w8a8"):
            q = jax.jit(
                lambda k: jax.random.randint(k, (L, O, K), -127, 127, jnp.int32)
                .astype(jnp.int8)
            )(k_i)
            layers[name] = {
                "q": q,
                "scale": jnp.full((L, O, 1), 0.001, jnp.float32),
            }
            kinds[name] = "int8"
        elif fmt == "fp8":
            # valid-e4m3 bit patterns (bits 0..126 = finite positives)
            q = jax.jit(
                lambda k: jax.lax.bitcast_convert_type(
                    jax.random.randint(k, (L, O, K), 0, 127, jnp.int32)
                    .astype(jnp.uint8),
                    jnp.float8_e4m3fn,
                )
            )(k_i)
            layers[name] = {
                "q": q,
                "scale": jnp.full((L, O, 1), 0.01, jnp.float32),
            }
            kinds[name] = fmt
        else:  # bf16 — small-magnitude bit patterns (uint16 < 0x3C00)
            w = jax.jit(
                lambda k: jax.lax.bitcast_convert_type(
                    jax.random.randint(k, (L, O, K), 0, 0x3C00, jnp.int32)
                    .astype(jnp.uint16),
                    jnp.bfloat16,
                )
            )(k_i)
            layers[name] = {"w": w}
            kinds[name] = "bf16"
    return layers, kinds


def cm_bytes(cm):
    import jax

    return sum(
        a.size * a.dtype.itemsize
        for a in jax.tree.leaves(cm.params["layers"])
    )


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def log_mem(tag):
    """Device HBM usage, when the backend exposes it. The axon relay
    returns all-zero stats (r03/r04 logs); flag that in the artifact so
    memory-based claims (the 2-chip bf16 normalization) are explicit about
    resting on the r02 measured-OOM evidence, not fresh stats (ADVICE r3)."""
    import jax

    try:
        st = jax.local_devices()[0].memory_stats() or {}
        used = st.get("bytes_in_use", 0)
        peak = st.get("peak_bytes_in_use", 0)
        lim = st.get("bytes_limit", 0)
        if not (used or peak or lim):
            BARRIER_FLAGS["mem_stats_unavailable"] = True
        log(f"mem[{tag}]: in_use {used/1e9:.2f} GB, peak {peak/1e9:.2f} GB, "
            f"limit {lim/1e9:.2f} GB")
    except Exception as e:  # relay may not implement memory_stats
        BARRIER_FLAGS["mem_stats_unavailable"] = True
        log(f"mem[{tag}]: unavailable ({type(e).__name__})")


def _cache_entries(cache_dir):
    """Entry count of the persistent compile cache (0 if unset/missing)."""
    try:
        return len(os.listdir(cache_dir)) if cache_dir else 0
    except OSError:
        return 0


BARRIER_FLAGS = {"readback_timeouts": 0}


def value_barrier(arr, timeout_s=None):
    """Force true completion via a value readback, with a watchdog.

    Value readbacks are the only honest barrier on this relay
    (block_until_ready returns at dispatch for donated buffers), but in some
    pool windows a readback stalls for many minutes. The watchdog runs the
    readback in a worker thread; on timeout it falls back to
    block_until_ready and marks the run so the JSON reports the barrier as
    unreliable rather than hanging the whole bench."""
    import threading

    import jax

    timeout_s = timeout_s or float(os.environ.get("BENCH_READBACK_TIMEOUT", "420"))
    done = threading.Event()

    def worker():
        try:
            np.asarray(arr)
        finally:
            done.set()

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        BARRIER_FLAGS["readback_timeouts"] += 1
        log(f"value readback exceeded {timeout_s:.0f}s — falling back to "
            "block_until_ready for this barrier (result flagged)")
        jax.block_until_ready(arr)


_EMBED_CACHE: dict = {}


def _shared_embed(vocab, h, dtype):
    """One device-resident embed/lm_head table shared by every engine.

    The 1.05 GB table is value-irrelevant to throughput; duplicating it per
    engine wastes HBM that the L32+anchor pair needs."""
    import jax.numpy as jnp

    import jax

    key = (vocab, h, jnp.dtype(dtype).name)
    if key not in _EMBED_CACHE:
        _EMBED_CACHE[key] = jax.jit(
            lambda k: (jax.random.normal(k, (vocab, h), jnp.float32) * 0.01)
            .astype(dtype)
        )(jax.random.PRNGKey(7))
    return _EMBED_CACHE[key]


def build_engine(fmt, n_layers):
    import dataclasses

    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.quant import get_preset
    from tensorrt_model_optimizer_tpu.quant.compress import CompressedModel
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine

    cfg = dataclasses.replace(
        llama.LlamaConfig.llama3_8b(), num_hidden_layers=n_layers
    )
    rng = np.random.default_rng(0)
    layers, kinds = synth_packed_layers(cfg, fmt, rng)
    h = cfg.hidden_size
    params = {
        "embed_tokens": _shared_embed(cfg.vocab_size, h, cfg.dtype),
        "layers": layers,
        "norm": jnp.ones((h,), cfg.dtype),
    }
    params["lm_head"] = params["embed_tokens"]

    if fmt == "w8a8":
        # act quantizers ON: drives the native int8-MXU W8A8 path
        from tensorrt_model_optimizer_tpu.quant.quantizer import QuantizerState

        layout = llama.build_layout(cfg, get_preset("INT8_DEFAULT_CFG"))
        qstate = {
            name: {"input": QuantizerState(
                amax=jnp.full((cfg.num_hidden_layers,), 3.0, jnp.float32))}
            for name in llama.PROJ_NAMES
        }
        cm = CompressedModel(cfg, params, kinds, layout, qstate)
    else:
        # weight-only serving: act quantizers off for the throughput benchmark
        cm = CompressedModel(cfg, params, kinds, llama.QuantLayout(sites=()), {})
    ecfg = serve_engine.EngineConfig(max_seq_len=MAXLEN, backend="pallas")
    # Default int4 serving = "a8" (W4A8: per-token int8 acts + s8xs8 MXU
    # dots), the reference's own fastest-4-bit-at-batch design point
    # (benchmark.md W4A8 rows) and this bench's headline: 2.004x
    # chip-normalized bf16 (engine_int4_a8.json) vs bd2's 1.713x. The JSON
    # records the layout so weight-only (bd2) numbers stay distinguishable.
    layout = os.environ.get("BENCH_LAYOUT") or ("a8" if FORMAT == "int4"
                                                else None)
    if layout:  # A/B the serving layouts (perm/word/blockdot) from the CLI
        import dataclasses as _dc

        ecfg = _dc.replace(ecfg, nvfp4_layout=layout, int4_layout=layout)
    kv = os.environ.get("BENCH_KV")  # int8/fp8 quantized KV cache — the
    # BS64 grid cells need it (bf16 KV at 64 x 2176 tokens = 17.8 GB > HBM)
    if kv is None and PREFILL >= 1024:
        kv = "int8"  # reference-scenario default (see PREFILL comment)
    if kv == "none":
        kv = None
    if kv:
        import dataclasses as _dc

        ecfg = _dc.replace(
            ecfg,
            kv_dtype={"int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
                      "nvfp4": "nvfp4", "nvfp4_fake": "nvfp4_fake"}[kv],
        )
    kvk_default = "1" if (kv == "int8" or kv == "nvfp4") else "0"
    if os.environ.get("BENCH_KVK", kvk_default) == "1":
        # packed-KV Pallas decode attention (kv-head-major stored cache;
        # ops/pallas/kv_attention.py) — r5 A/B knob
        import dataclasses as _dc

        ecfg = _dc.replace(ecfg, kv_attention_kernel=True)
    eng = serve_engine.Engine(cm, ecfg)
    # return the ENGINE's cm: Engine converts nvfp4 to the serving layout, and
    # holding the pre-conversion packed weights too doubles HBM (OOMed)
    return cfg, eng.cm, eng


class TimedEngine:
    """Holds an engine + persistent decode state for interleaved timing.

    Times at `unroll` chained steps per dispatch (multi-step scheduling).
    Also runs an unroll=1 series so the per-dispatch overhead floor is
    visible: floor ~= ms1 - msK (per real step)."""

    def __init__(self, fmt, n_layers, label, unroll):
        import jax
        import jax.numpy as jnp

        self.label = label
        self.unroll = unroll
        self.cfg, self.cm, self.eng = build_engine(fmt, n_layers)
        rng = np.random.default_rng(1)
        self.cache = self.eng.init_cache(BATCH, MAXLEN)
        self.cache["pos"] = jnp.asarray(PREFILL, jnp.int32)
        self.tok = jnp.asarray(
            rng.integers(0, self.cfg.vocab_size, size=(BATCH, 1), dtype=np.int32)
        )
        self.also_unroll1 = os.environ.get("BENCH_UNROLL1", "0") == "1"
        # Split trace+compile (synchronous, inside the first decode_step
        # call) from first execution + relay drain (the barrier), and count
        # persistent-cache entries to tell a cache miss from a slow relay
        # window — r03's unexplained 415 s "compile" was indistinguishable
        # from a degraded relay without this split (VERDICT r3 item #9).
        cache_dir = jax.config.jax_compilation_cache_dir
        n_before = _cache_entries(cache_dir)
        t0 = time.time()
        self.tok, self.cache = self.eng.decode_step(self.tok, self.cache, unroll)
        if unroll > 1 and self.also_unroll1:
            self.tok, self.cache = self.eng.decode_step(self.tok, self.cache, 1)
        t1 = time.time()
        value_barrier(self.tok)  # drain compile + first exec
        self.compile_s = time.time() - t0
        self.trace_compile_s = t1 - t0
        self.first_exec_s = time.time() - t1
        self.cache_misses = _cache_entries(cache_dir) - n_before
        log(f"{label}: built ({cm_bytes(self.cm)/1e9:.2f} GB), "
            f"decode-step compile+first {self.compile_s:.1f}s "
            f"(trace+compile {self.trace_compile_s:.1f}s, first exec+drain "
            f"{self.first_exec_s:.1f}s, new cache entries {self.cache_misses})")
        log_mem(label)
        self.times: list = []
        self.times1: list = []

    def _block(self, unroll, out):
        # Timing protocol for the axon relay (memory notes): dispatches are
        # async and `block_until_ready` can return at dispatch time for
        # donated buffers (0.014 ms "8B steps" = 262 TB/s, impossible), so
        # every block ends with a VALUE readback of the final token, which
        # drains the chain for real. Positions advance monotonically — a
        # constant-pos replay can hit relay-level caching.
        n_disp = max(STEPS // unroll, 1)
        t0 = time.time()
        for i in range(n_disp):
            self.tok, self.cache = self.eng.decode_step(self.tok, self.cache, unroll)
            if SYNC_EVERY and (i + 1) % SYNC_EVERY == 0 and i + 1 < n_disp:
                value_barrier(self.tok)  # cap in-flight donated caches
        value_barrier(self.tok)
        out.append((time.time() - t0) / (n_disp * unroll) * 1e3)
        if os.environ.get("BENCH_MEMLOG", "0") == "1":
            log_mem(f"{self.label} post-block")

    def run_block(self):
        self._block(self.unroll, self.times)
        if self.unroll > 1 and self.also_unroll1:
            self._block(1, self.times1)

    @staticmethod
    def _median(ts):
        ts = sorted(ts[1:] or ts)
        return ts[len(ts) // 2]

    def median_ms(self):
        return self._median(self.times)

    def median_ms1(self):
        return self._median(self.times1) if self.times1 else None


DEADLINE = [None]  # set in main(); soft global budget for slow pool windows


def past_deadline():
    return DEADLINE[0] is not None and time.time() > DEADLINE[0]


def interleaved_time(engines, rounds):
    """Alternate STEPS-step blocks across the engines, `rounds` times each.

    The axon pool drifts up to 100x between windows (memory notes); only
    comparisons whose blocks alternate inside one window are trustworthy.
    If the soft deadline passes and every engine has at least one timed
    block, stop early and report what we have — a JSON line from a slow
    window beats a driver timeout with no artifact at all."""
    for r in range(rounds):
        for e in engines:
            e.run_block()
        if past_deadline() and all(e.times for e in engines):
            log(f"deadline passed after round {r + 1}/{rounds} — reporting early")
            BARRIER_FLAGS["deadline_cut"] = r + 1
            break
    for e in engines:
        m1 = e.median_ms1()
        log(f"{e.label}: median {e.median_ms():.3f} ms/step at unroll={e.unroll}"
            + (f", {m1:.3f} at unroll=1" if m1 else "")
            + f" (blocks: {[round(t, 3) for t in e.times]})")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    DEADLINE[0] = time.time() + float(os.environ.get("BENCH_DEADLINE", "2700"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "5"))
    unroll = int(os.environ.get("BENCH_UNROLL", "8"))
    unroll1_series = os.environ.get("BENCH_UNROLL1", "0") == "1"
    budget = PREFILL + (unroll + 1) + rounds * STEPS * (2 if unroll1_series else 1)
    if budget > MAXLEN:
        raise SystemExit(
            f"decode budget {budget} exceeds BENCH_MAXLEN={MAXLEN}: raise "
            "BENCH_MAXLEN or lower BENCH_ROUNDS/BENCH_STEPS (pos never resets "
            "— constant-pos replay hits relay caching)"
        )

    # HBM budget (~15.7 GB): bf16-L16 anchor (8 GB) + fmt-L32 (<=4 GB for the
    # 4-bit formats) + fmt-L16 raw-ratio leg coexist for 4-bit formats. The
    # 8-bit formats' L32 (8 GB) can't share the chip with the bf16 anchor +
    # an L16 leg, so they interleave anchor + L32 only.
    fourbit = FORMAT in ("int4", "nvfp4")
    # Build the measured-format engine FIRST: its packed-layout conversion
    # (nvfp4 perm) needs transient headroom that isn't there once the bf16
    # anchor is resident (observed RESOURCE_EXHAUSTED the other way round).
    n_layers = 16 if FORMAT == "bf16" else 32
    full = (None if FORMAT == "bf16"
            else TimedEngine(FORMAT, n_layers, f"{FORMAT} L{n_layers}", unroll))
    # BENCH_ANCHOR=0: skip the in-process bf16 anchor — the grid driver
    # (tools/bench_grid.py) runs one anchor PROCESS per batch size instead,
    # because at the 2048-token reference scenario the anchor + an 8-bit
    # format cannot share the chip (fp8 L32 8 GB + KV + anchor 8 GB > HBM).
    with_anchor = os.environ.get("BENCH_ANCHOR", "1") == "1" or FORMAT == "bf16"
    anchor = (TimedEngine("bf16", 16, "bf16 L16 (TP2 per-chip anchor)", unroll)
              if with_anchor else None)
    if full is None:
        full = anchor
    engines = [e for e in (full, anchor) if e is not None]
    engines = list(dict.fromkeys(engines))
    fmt_l16 = None
    # raw-ratio leg off by default: a third engine + compile arena pushed
    # the chip into RESOURCE_EXHAUSTED alongside the bf16 anchor
    if FORMAT != "bf16" and fourbit and os.environ.get("BENCH_RAW_LEG", "0") == "1":
        fmt_l16 = TimedEngine(FORMAT, 16, f"{FORMAT} L16 (raw-ratio leg)", unroll)
        engines.append(fmt_l16)

    interleaved_time(engines, rounds)
    bf16_ms = anchor.median_ms() if anchor is not None else None
    bf16_toks = BATCH * 1e3 / bf16_ms if bf16_ms else None
    fmt_l16_ms = fmt_l16.median_ms() if fmt_l16 else None
    fmt_ms = full.median_ms()
    compile_s = full.compile_s
    cfg, eng = full.cfg, full.eng
    tok_s = BATCH * 1e3 / fmt_ms

    # TTFT: p50 prefill latency for the PREFILL-token prompt over >= 5
    # repeats (baseline scenario uses 2048-in; set BENCH_PREFILL=2048 for
    # the grid number). All decode medians are already taken, so the bf16
    # anchor (8 GB) is RELEASED first — the fp8 prefill graph
    # RESOURCE_EXHAUSTED with it resident (round-2 artifact gap).
    ttft_ms = None
    ttft_reps = int(os.environ.get("BENCH_TTFT_REPEATS", "5"))
    if os.environ.get("BENCH_TTFT", "1") == "1" and not past_deadline():
        if anchor is not None and anchor is not full:
            anchor.eng = anchor.cm = anchor.cache = anchor.tok = None
            engines = [e for e in engines if e is not anchor]
            if fmt_l16 is not None and fmt_l16 is not full:
                fmt_l16.eng = fmt_l16.cm = fmt_l16.cache = fmt_l16.tok = None
            import gc

            gc.collect()
            log_mem("anchor released (pre-TTFT)")
        try:
            rng = np.random.default_rng(2)
            prompt = jnp.asarray(
                rng.integers(0, cfg.vocab_size, size=(BATCH, PREFILL), dtype=np.int32)
            )
            pc = eng.init_cache(BATCH, MAXLEN)
            logits, _ = eng.prefill(prompt, pc)
            value_barrier(logits[..., -1, :1])  # compile + first exec
            ts = []
            for _ in range(ttft_reps):
                pc = eng.init_cache(BATCH, MAXLEN)
                t0 = time.time()
                logits, _ = eng.prefill(prompt, pc)
                value_barrier(logits[..., -1, :1])
                ts.append((time.time() - t0) * 1e3)
            ttft_ms = sorted(ts)[len(ts) // 2]
            log(f"prefill({PREFILL}) TTFT p50/{ttft_reps}: {ttft_ms:.1f} ms "
                f"(all: {[round(t, 1) for t in ts]})")
        except Exception as e:  # pragma: no cover - chip-memory dependent
            log(f"TTFT skipped: {type(e).__name__}: {str(e)[:120]}")

    if FORMAT == "bf16":
        vs = 0.5  # itself, normalized by the 2 chips bf16 8B requires
        raw_ratio = 1.0
    elif bf16_toks is None:
        vs = None  # anchor skipped (grid mode) — driver pairs processes
        raw_ratio = None
    else:
        vs = tok_s / (bf16_toks / 2.0)
        raw_ratio = bf16_ms / fmt_l16_ms if fmt_l16_ms else None
    print(json.dumps({
        "metric": f"llama3.1-8b-{FORMAT}-decode-tok/s/chip-bs{BATCH}",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        **({"vs_baseline": round(vs, 3)} if vs is not None else {}),
        "baseline": "own bf16 same-session, chip-normalized (bf16 8B needs 2 "
                    "chips: measured OOM on 1; reference normalizes its 70B "
                    "rows the same way, benchmark.md:11-14,26-28)",
        "step_ms": round(fmt_ms, 3),
        **({"bf16_anchor_ms_L16": round(bf16_ms, 3)}
           if bf16_ms is not None else {}),
        **({"raw_same_shape_ratio_L16": round(raw_ratio, 3)}
           if raw_ratio is not None else {}),
        "unroll": unroll,
        **({"step_ms_unroll1": round(full.median_ms1(), 3)}
           if unroll > 1 and full.median_ms1() is not None else {}),
        **({"bf16_anchor_ms_unroll1": round(anchor.median_ms1(), 3)}
           if unroll > 1 and anchor is not None
           and anchor.median_ms1() is not None else {}),
        "compile_s": round(compile_s, 1),
        "trace_compile_s": round(full.trace_compile_s, 1),
        "first_exec_s": round(full.first_exec_s, 1),
        "cache_misses": full.cache_misses,
        "format": FORMAT, "bs": BATCH, "prefill": PREFILL, "steps": STEPS,
        **({"layout": full.eng.ecfg.int4_layout if FORMAT == "int4"
            else full.eng.ecfg.nvfp4_layout}
           if FORMAT in ("int4", "nvfp4") else {}),
        **({"serving_semantics": "W4A8: int4 weights + per-token int8 "
            "acts on the s8 MXU (reference W4A8-AWQ rows)"}
           if FORMAT == "int4"
           and full.eng.ecfg.int4_layout == "a8" else {}),
        "hw": jax.devices()[0].device_kind,
        **({"barrier_unreliable": BARRIER_FLAGS["readback_timeouts"]}
           if BARRIER_FLAGS["readback_timeouts"] else {}),
        **({"deadline_cut_after_round": BARRIER_FLAGS["deadline_cut"]}
           if BARRIER_FLAGS.get("deadline_cut") else {}),
        **({"mem_stats_unavailable": True, "chip2_norm_evidence":
            "r02 measured OOM (fresh memory stats are all-zero on relay)"}
           if BARRIER_FLAGS.get("mem_stats_unavailable") else {}),
        **({"ttft_ms": round(ttft_ms, 1), "ttft_stat": f"p50/{ttft_reps}"}
           if ttft_ms is not None else {}),
        **({"kv": os.environ["BENCH_KV"]} if os.environ.get("BENCH_KV") else {}),
        "h200_context_tok_s": H200_BS8.get(FORMAT),
    }))


if __name__ == "__main__":
    sys.exit(main())
