#!/usr/bin/env python
"""Probe: XLA-native sub-byte weights (jnp.int4 / float4_e2m1fn) convert-dot.

Round-3 verdict: the hand-written Pallas nibble-decode kernels are VPU-bound
(~15 GB/s packed-byte stream vs bf16's ~723 GB/s weight stream on the same
shape); the untried escalation is to let XLA:TPU own the sub-byte storage:

  - weights stored as jnp.int4 (XLA S4, packed in HBM: layout T(8,128)(8,1))
    or jnp.float4_e2m1fn, created INSIDE jit (axon host transfers of
    sub-byte arrays crash — verified 2026-08-20);
  - the matmul is `x @ w.astype(bf16)` — XLA fuses the convert into the dot
    the same way the fast int8/fp8 paths work;
  - per-K-block scales (AWQ 128 / NVFP4 16) are applied by a grouped
    contraction: einsum('bgk,ogk->gbo') then einsum('gbo,og->bo'), which
    keeps the scale application out of the weight-stream hot path.

Methodology (the blessed one, VERDICT r3 weak #7): SLOPE timing over
streamed weights — one jit'd lax.scan over N distinct layer weights, timed
at two N values; slope = (T2-T1)/(N2-N1) removes dispatch + non-streamed
overheads. Value readbacks (np.asarray of a bf16 slice) are the only honest
barrier on the relay.

Reference anchor: the INT4-AWQ/NVFP4 rows of
/root/reference/examples/benchmark.md:23-25 are the numbers this path must
let the engine reach (>=1.7x bf16 decode).

Usage: python tools/probe_int4_native.py [BS] > probe.json
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K, O = 4096, 14336  # 8B gate-proj
REPEATS = int(os.environ.get("PROBE_REPEATS", "5"))
N1 = int(os.environ.get("PROBE_N1", "8"))
N2 = int(os.environ.get("PROBE_N2", "24"))


def log(m):
    print(f"[probe-native] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BS, K)).astype(np.float32),
        jnp.bfloat16,
    )

    # --- weight builders: all ON DEVICE inside jit ------------------------
    def build_bf16(n):
        return jax.jit(lambda k: (jax.random.normal(
            k, (n, O, K), jnp.float32) * 0.01).astype(jnp.bfloat16))(
            jax.random.PRNGKey(1))

    def build_int8(n):
        return jax.jit(lambda k: jax.random.randint(
            k, (n, O, K), -127, 127, jnp.int32).astype(jnp.int8))(
            jax.random.PRNGKey(2))

    def build_int4(n):
        return jax.jit(lambda k: jax.random.randint(
            k, (n, O, K), -8, 8, jnp.int32).astype(jnp.int4))(
            jax.random.PRNGKey(3))

    def build_fp4(n):
        return jax.jit(lambda k: (jax.random.normal(
            k, (n, O, K), jnp.float32)).astype(jnp.float4_e2m1fn))(
            jax.random.PRNGKey(4))

    scale_o = jnp.full((O,), 0.01, jnp.float32)

    # --- variants: scan over n weights, carry accumulates -----------------
    def scan_time(step, ws, extra=()):
        # x-chained carry: identical repeat calls get replay-cached by the
        # relay (this probe's own bf16 run read "4154 GB/s" > HBM peak,
        # 2026-08-20, with an acc-carry + constant args). Same design as
        # tools/probe_qmm_scan.py.
        @jax.jit
        def run(x, ws, *extra):
            def body(x, w):
                y = step(x, w, *extra)  # [BS, O] f32
                return x + (y[:, :1] * 1e-6).astype(x.dtype), None
            x2, _ = lax.scan(body, x, ws)
            return x2

        xc = run(x, ws, *extra)
        np.asarray(xc[0, :8])  # compile + first exec drained
        ts = []
        for _ in range(REPEATS):
            t0 = time.time()
            xc = run(xc, ws, *extra)
            np.asarray(xc[0, :8])
            ts.append(time.time() - t0)
        ts = sorted(ts)
        return ts[len(ts) // 2]

    def bf16_step(x, w):
        return jnp.einsum("bk,ok->bo", x, w,
                          preferred_element_type=jnp.float32)

    def conv_step(x, w):  # int8/int4/fp4 -> convert-dot, per-O scale
        y = jnp.einsum("bk,ok->bo", x, w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y * scale_o[None, :]

    def grouped_step_factory(bsz):
        G = K // bsz
        sc = jnp.full((O, G), 0.01, jnp.float32)

        def step(x, w):
            t = jnp.einsum(
                "bgk,ogk->gbo", x.reshape(BS, G, bsz),
                w.astype(jnp.bfloat16).reshape(O, G, bsz),
                preferred_element_type=jnp.float32)
            return jnp.einsum("gbo,og->bo", t, sc)
        return step

    variants = [
        ("bf16", build_bf16, bf16_step, 2.0),
        ("int8_native", build_int8, conv_step, 1.0),
        ("int4_native_flat", build_int4, conv_step, 0.5),
        ("int4_native_g128", build_int4, grouped_step_factory(128), 0.5),
        ("fp4_native_flat", build_fp4, conv_step, 0.5),
        ("fp4_native_g16", build_fp4, grouped_step_factory(16), 0.5),
    ]
    if os.environ.get("PROBE_VARIANTS"):
        keep = set(os.environ["PROBE_VARIANTS"].split(","))
        variants = [v for v in variants if v[0] in keep]

    res = {"bs": BS, "K": K, "O": O, "n1": N1, "n2": N2, "repeats": REPEATS}
    slopes = {}
    for name, build, step, bytes_per in variants:
        try:
            t_pair = []
            for n in (N1, N2):
                ws = build(n)
                t = scan_time(step, ws)
                t_pair.append(t)
                log(f"{name} N={n}: {t*1e3:.2f} ms")
                del ws
            slope = (t_pair[1] - t_pair[0]) / (N2 - N1)
            gbs = (O * K * bytes_per) / slope / 1e9
            slopes[name] = slope
            res[name] = {
                "t_n1_ms": round(t_pair[0] * 1e3, 3),
                "t_n2_ms": round(t_pair[1] * 1e3, 3),
                "slope_us_per_weight": round(slope * 1e6, 1),
                "stream_gb_s": round(gbs, 1),
            }
            log(f"{name}: slope {slope*1e6:.0f} us/weight, {gbs:.0f} GB/s")
        except Exception as e:  # keep going; partial JSON beats none
            res[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}")
    if "bf16" in slopes:
        for name in slopes:
            if name != "bf16":
                res[name]["speedup_vs_bf16"] = round(
                    slopes["bf16"] / slopes[name], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
