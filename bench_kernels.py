#!/usr/bin/env python
"""Kernel microbenchmarks: fused dequant-matmul at llama-8B gate-proj shape.

THE canonical methodology (VERDICT r3 weak #7 asked for exactly one):
SLOPE timing over STREAMED weights — a jit'd lax.scan chains the matmul
over N distinct stacked weights (accumulating into the carry), timed at two
N values; slope = (T(N2) - T(N1)) / (N2 - N1) is the marginal cost of one
weight-streaming matmul, free of dispatch overhead and of the
single-cached-weight artifact the old fori-chain had (one weight re-used 16
times can sit in CMEM/VMEM — decode streams every layer's weights from HBM
exactly once per step, which is what the slope measures). The engine A/B
(bench.py) remains the arbiter; this ranks kernels under the same regime.

Value readbacks (np.asarray of a small bf16 slice) are the only honest
barrier on the relay. Weights are synthesized ON DEVICE inside jit (a host
upload of [N, O, K] through the relay stalls for minutes in slow windows).

Usage: python bench_kernels.py [BS] > kernels.json
Env: KB_N1/KB_N2 (default 4/12), KB_REPEATS (5), KB_VARIANTS=csv filter.
"""

import json
import os
import sys
import time

import numpy as np

# N2 - N1 sets the slope signal: ~0.7 ms/weight (bf16 gate shape) x 32 =
# ~22 ms against 1-3 ms of relay per-call noise. The old 4/12 delta (r04
# first run) was 8 weights = ~6 ms signal — swamped, produced negative
# slopes and >HBM-peak rates (artifacts/bench_r04/kernels_bs8.json).
N1 = int(os.environ.get("KB_N1", "8"))
N2 = int(os.environ.get("KB_N2", "40"))
REPEATS = int(os.environ.get("KB_REPEATS", "5"))
HBM_PEAK_GBPS = 900.0  # v5e ~819 GB/s; anything above is a timing artifact
O = int(os.environ.get("KB_O", "14336"))  # overridable for CPU smoke tests
K = int(os.environ.get("KB_K", "4096"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _w48_step(qmm, x, w):
    """W4A8 serving step incl. the per-token int8 act quant the engine does
    (engine.py _qlinear int4w48 branch) — engine-faithful regime."""
    import jax.numpy as jnp

    x32 = x.astype(jnp.float32)
    a_amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    a_scale = jnp.where(a_amax == 0, 1.0, a_amax / 127.0)
    x8 = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    return qmm.qmm_int4_w48(x8, *w) * a_scale


def main():
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.ops.pallas import qmm

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    key = jax.random.PRNGKey(7)

    # --- on-device stacked-weight builders --------------------------------
    def u8(n, shape):
        return jax.jit(lambda k: jax.random.randint(
            k, (n, *shape), 0, 256, jnp.int32).astype(jnp.uint8))(key)

    def bf16w(n):
        return jax.jit(lambda k: (jax.random.normal(
            k, (n, O, K), jnp.float32) * 0.02).astype(jnp.bfloat16))(key)

    def i8w(n):
        return jax.jit(lambda k: jax.random.randint(
            k, (n, O, K), -127, 127, jnp.int32).astype(jnp.int8))(key)

    def f8w(n):
        return jax.jit(lambda k: jax.lax.bitcast_convert_type(
            jax.random.randint(k, (n, O, K), 0, 127, jnp.int32)
            .astype(jnp.uint8), jnp.float8_e4m3fn))(key)

    def i4xw(n):  # int4x storage: uint8 [O, K/2], s4 view made inside jit
        return u8(n, (O, K // 2))

    s8 = jnp.full((O, 1), 1e-3, jnp.float32)
    sl = jnp.full((O // 2, K // 128), 1e-3, jnp.float32)
    slf4 = jnp.full((O // 2, K // 16), 1.0, jnp.float32)
    gs = jnp.asarray(1e-3, jnp.float32)
    s_xla = jnp.full((O, K // 128), 1e-3, jnp.float32)

    def packed_planes(n):
        return u8(n, (O // 2, K))

    def vpack(pack, *scales):
        def build(n):
            qmm._bitcast_order()  # probes read concrete values — run (and
            qmm._bitcast_order_i8()  # cache) eagerly before the pack fns
            # are traced (see compress._map_leading)
            planes = packed_planes(n)
            return jax.jit(jax.vmap(lambda p: pack(p, *scales)))(planes)
        return build

    # (name, builder -> weight pytree [N, ...], step(x, w)->[B,O], packed bytes)
    variants = [
        ("bf16_xla", bf16w, lambda x, w: (x @ w.T).astype(jnp.float32),
         O * K * 2),
        ("int8_xla", i8w,
         lambda x, w: jax.lax.dot_general(
             x, w.astype(x.dtype), (((1,), (1,)), ((), ())),
             preferred_element_type=jnp.float32) * s8.reshape(1, -1),
         O * K),
        ("int8_pallas", i8w,
         lambda x, w: qmm.qmm_int8(x, w, s8).astype(jnp.float32), O * K),
        ("fp8_xla", f8w,
         lambda x, w: jax.lax.dot_general(
             x, w.astype(x.dtype), (((1,), (1,)), ((), ())),
             preferred_element_type=jnp.float32) * s8.reshape(1, -1),
         O * K),
        ("int4_blockdot", packed_planes,
         lambda x, w: qmm.qmm_int4(x, w, sl, sl).astype(jnp.float32),
         O * K // 2),
        ("int4_word", vpack(lambda p: qmm.int4_word_pack(p, sl, sl)),
         lambda x, w: qmm.qmm_int4_word(x, *w).astype(jnp.float32),
         O * K // 2),
        ("int4_word2", vpack(lambda p: qmm.int4_word2_pack(p, sl, sl)),
         lambda x, w: qmm.qmm_int4_word2(x, *w).astype(jnp.float32),
         O * K // 2),
        ("int4_bd2", vpack(lambda p: qmm.int4_bd2_pack(p, sl, sl)),
         lambda x, w: qmm.qmm_int4_bd2(
             x, *w, fuse_groups=False).astype(jnp.float32),
         O * K // 2),
        ("int4_bd3", vpack(lambda p: qmm.int4_bd2_pack(p, sl, sl)),
         lambda x, w: qmm.qmm_int4_bd2(
             x, *w, fuse_groups=True).astype(jnp.float32),
         O * K // 2),
        ("int4_xla", i4xw,
         lambda x, w: qmm.qmm_int4_xla(
             x, {"qpacked": w, "scale": s_xla}).astype(jnp.float32),
         O * K // 2),
        ("int4_w48", vpack(lambda p: qmm.int4_w48_pack(p, sl, sl)),
         lambda x, w: _w48_step(qmm, x, w), O * K // 2),
        ("nvfp4_word", vpack(lambda p: qmm.nvfp4_word_pack(p, slf4, slf4)),
         lambda x, w: qmm.qmm_nvfp4_word(x, *w, gs).astype(jnp.float32),
         O * K // 2),
        ("nvfp4_word2", vpack(lambda p: qmm.nvfp4_word2_pack(p, slf4, slf4)),
         lambda x, w: qmm.qmm_nvfp4_word2(x, *w, gs).astype(jnp.float32),
         O * K // 2),
    ]
    if os.environ.get("KB_VARIANTS"):
        keep = set(os.environ["KB_VARIANTS"].split(","))
        variants = [v for v in variants if v[0] in keep]

    def scan_time(step, ws):
        # the carry is X, folded with each output — every scan iteration AND
        # every repeat call sees different values. Identical repeat calls
        # get replay-cached by the relay (probe_native bf16 "4154 GB/s" >
        # HBM peak, 2026-08-20); the x-chain defeats that, same design as
        # tools/probe_qmm_scan.py.
        @jax.jit
        def run(x, ws):
            def body(x, w):
                y = step(x, w)  # [B, O] f32
                return x + (y[:, :1] * 1e-6).astype(x.dtype), None
            x, _ = jax.lax.scan(body, x, ws)
            return x

        x = run(x0, ws)
        np.asarray(x[0, :8])  # compile + first exec drained
        ts = []
        for _ in range(REPEATS):
            t0 = time.time()
            x = run(x, ws)
            np.asarray(x[0, :8])
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    results = {"bs": B, "shape": [O, K], "n1": N1, "n2": N2,
               "methodology": "slope over streamed weights (lax.scan)"}
    slopes = {}
    for name, build, step, wbytes in variants:
        try:
            pair = []
            for n in (N1, N2):
                ws = build(n)
                pair.append(scan_time(step, ws))
                del ws
            slope = (pair[1] - pair[0]) / (N2 - N1)
            gbps = wbytes / slope / 1e9 if slope > 0 else float("-inf")
            results[name] = {
                "us": round(slope * 1e6, 1),
                "GBps": round(wbytes / slope / 1e9, 1),
            }
            if slope <= 0 or gbps > HBM_PEAK_GBPS:
                # physically impossible — noise/replay artifact, don't rank
                results[name]["invalid"] = True
            else:
                slopes[name] = slope
            log(f"{name:14s} {slope*1e6:9.1f} us  "
                f"{wbytes/slope/1e9:8.1f} GB/s"
                + ("  INVALID" if "invalid" in results[name] else ""))
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
            log(f"{name:14s} FAIL {type(e).__name__}: {str(e)[:160]}")
    if "bf16_xla" in slopes:
        for n in slopes:
            if n != "bf16_xla":
                results[n]["speedup_vs_bf16"] = round(
                    slopes["bf16_xla"] / slopes[n], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
