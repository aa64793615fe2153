#!/usr/bin/env python
"""Per-projection decode-GEMM probe in the ENGINE's regime.

bench_kernels.py (fori_loop over ONE weight) disagrees with engine-level
timing by ~15x on this backend; this probe mirrors what the serving engine
actually does per decode step — `lax.scan` over L stacked per-layer weights,
each iteration one fused dequant-matmul — so its per-layer microseconds are
directly comparable to `Engine.decode_step` cost per projection.

Formats are interleaved round-robin (pool drift hits all equally); each
timed block ends with a VALUE readback (relay async-dispatch notes in
BENCH_RESULTS.md).

Usage: PROBE_FORMATS=bf16,int4,nvfp4p,nvfp4w python tools/probe_qmm_scan.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

L = int(os.environ.get("PROBE_LAYERS", "32"))
B = int(os.environ.get("PROBE_BS", "8"))
O = int(os.environ.get("PROBE_O", "14336"))
K = int(os.environ.get("PROBE_K", "4096"))
REPS = int(os.environ.get("PROBE_REPS", "4"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "3"))
FORMATS = os.environ.get(
    "PROBE_FORMATS",
    "bf16,int8,fp8,int4,int4w,nvfp4,nvfp4p,nvfp4w,nvfp4_xla",
).split(",")


def log(msg):
    print(f"[probe] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.ops.pallas import qmm

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.fold_in(key, 99), (B, K), jnp.bfloat16)

    def stacked_u8(k, shape):
        return jax.jit(
            lambda kk: jax.random.randint(kk, shape, 0, 256, jnp.int32).astype(
                jnp.uint8
            )
        )(k)

    builders = {}

    def reg(name, bytes_per_layer):
        def deco(fn):
            builders[name] = (fn, bytes_per_layer)
            return fn

        return deco

    @reg("bf16", O * K * 2)
    def build_bf16():
        w = jax.jit(
            lambda k: jax.lax.bitcast_convert_type(
                jax.random.randint(k, (L, O, K), 0, 0x3C00, jnp.int32).astype(
                    jnp.uint16
                ),
                jnp.bfloat16,
            )
        )(key)
        return (w,), lambda x, w: x @ w.T

    @reg("int8", O * K)
    def build_int8():
        q = jax.jit(
            lambda k: jax.random.randint(k, (L, O, K), -127, 127, jnp.int32).astype(
                jnp.int8
            )
        )(key)
        s = jnp.full((L, O, 1), 1e-3, jnp.float32)
        return (q, s), lambda x, q, s: qmm.qmm_int8(x, q, s)

    @reg("fp8", O * K)
    def build_fp8():
        q = jax.jit(
            lambda k: jax.lax.bitcast_convert_type(
                jax.random.randint(k, (L, O, K), 0, 127, jnp.int32).astype(jnp.uint8),
                jnp.float8_e4m3fn,
            )
        )(key)
        s = jnp.full((L, O, 1), 1e-2, jnp.float32)
        return (q, s), lambda x, q, s: qmm.qmm_fp8(x, q, s)

    @reg("int8_xla", O * K)
    def build_int8_xla():
        # XLA-native: convert fused into the dot, per-channel scale applied
        # to the [N, O] output (cheap) — no Pallas
        q = jax.jit(
            lambda k: jax.random.randint(k, (L, O, K), -127, 127, jnp.int32).astype(
                jnp.int8
            )
        )(key)
        s = jnp.full((L, 1, O), 1e-3, jnp.float32)
        return (q, s), lambda x, q, s: (
            jax.lax.dot_general(
                x, q.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s
        ).astype(x.dtype)

    @reg("fp8_xla", O * K)
    def build_fp8_xla():
        q = jax.jit(
            lambda k: jax.lax.bitcast_convert_type(
                jax.random.randint(k, (L, O, K), 0, 127, jnp.int32).astype(jnp.uint8),
                jnp.float8_e4m3fn,
            )
        )(key)
        s = jnp.full((L, 1, O), 1e-2, jnp.float32)
        return (q, s), lambda x, q, s: (
            jax.lax.dot_general(
                x, q.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s
        ).astype(x.dtype)

    @reg("int4_xla_chan", O * K // 2)
    def build_int4_xla_chan():
        # XLA-native s4 dtype: convert fused into the dot? Per-channel scale
        # on the output. (jnp.int4 packs two values/byte in HBM.)
        q = jax.jit(
            lambda k: jax.random.randint(k, (L, O, K), -8, 8, jnp.int32).astype(
                jnp.int4
            )
        )(key)
        s = jnp.full((L, 1, O), 1e-3, jnp.float32)
        return (q, s), lambda x, q, s: (
            jax.lax.dot_general(
                x, q.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s
        ).astype(x.dtype)

    @reg("int4_xla_block", O * K // 2)
    def build_int4_xla_block():
        # s4 with per-(O, K/128)-block scales via a grouped einsum: the
        # [N, O, K/128] partials get scaled then summed over blocks.
        q = jax.jit(
            lambda k: jax.random.randint(k, (L, O, K), -8, 8, jnp.int32).astype(
                jnp.int4
            )
        )(key)
        s = jnp.full((L, O, K // 128), 1e-3, jnp.float32)

        def f(x, q, s):
            xg = x.reshape(B, -1, 128)
            qg = q.reshape(O, -1, 128).astype(jnp.bfloat16)
            part = jnp.einsum(
                "bgk,ogk->bog", xg, qg, preferred_element_type=jnp.float32
            )
            return (part * s[None]).sum(axis=-1).astype(x.dtype)

        return (q, s), f

    @reg("int4_xla_bitcast", O * K // 2)
    def build_int4_xla_bitcast():
        # s4 storage workaround for the axon relay (native s4 arrays crash
        # on transfer): store packed uint8 [O, K/2], bitcast to s4 INSIDE
        # the step, let XLA convert-fuse into the dot like int8_xla.
        p = stacked_u8(key, (L, O, K // 2))
        s = jnp.full((L, 1, O), 1e-3, jnp.float32)

        def f(x, p, s):
            w4 = jax.lax.bitcast_convert_type(p, jnp.int4)  # [O, K/2, 2]
            w = w4.reshape(O, K).astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (y * s).astype(x.dtype)

        return (p, s), f

    @reg("int4_xla_u8swar", O * K // 2)
    def build_int4_xla_u8swar():
        # no-s4 control: unpack nibbles with u8 shifts in plain XLA (the
        # round-2 "XLA decompress" regime) — isolates whether s4 bitcast
        # buys anything over hand-unpacking.
        p = stacked_u8(key, (L, O, K // 2))
        s = jnp.full((L, 1, O), 1e-3, jnp.float32)

        def f(x, p, s):
            p32 = p.astype(jnp.int32)
            lo = ((p32 & 0xF) ^ 8) - 8
            hi = (((p32 >> 4) & 0xF) ^ 8) - 8
            w = jnp.stack([lo, hi], axis=-1).reshape(O, K).astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (y * s).astype(x.dtype)

        return (p, s), f

    @reg("int4", O * K // 2)
    def build_int4():
        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 128), 1e-3, jnp.float32)
        return (p, s, s), lambda x, p, a, b: qmm.qmm_int4(x, p, a, b)

    @reg("int4w", O * K // 2)
    def build_int4w():
        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 128), 1e-3, jnp.float32)
        pw, sw = jax.vmap(qmm.int4_word_pack)(p, s, s)
        return (pw, sw), lambda x, p, s: qmm.qmm_int4_word(x, p, s)

    @reg("int4w2", O * K // 2)
    def build_int4w2():
        qmm._bitcast_order()  # cache the probe before vmap tracing
        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 128), 1e-3, jnp.float32)
        pw, sw = jax.vmap(qmm.int4_word2_pack)(p, s, s)
        return (pw, sw), lambda x, p, s: qmm.qmm_int4_word2(x, p, s)

    @reg("int4b2", O * K // 2)
    def build_int4b2():
        qmm._bitcast_order()
        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 128), 1e-3, jnp.float32)
        pw, sw = jax.vmap(qmm.int4_bd2_pack)(p, s, s)
        return (pw, sw), lambda x, p, s: qmm.qmm_int4_bd2(x, p, s)

    @reg("nvfp4w2", O * K // 2)
    def build_nvfp4w2():
        qmm._bitcast_order()
        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 16), 1.0, jnp.float8_e4m3fn)
        g = jnp.full((L,), 1e-2, jnp.float32)
        pw, sw = jax.vmap(lambda pp, aa, bb: qmm.nvfp4_word2_pack(pp, aa, bb))(p, s, s)
        return (pw, sw, g), lambda x, p, s, g: qmm.qmm_nvfp4_word2(x, p, s, g)

    @reg("nvfp4", O * K // 2)
    def build_nvfp4():
        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 16), 1.0, jnp.float8_e4m3fn)
        g = jnp.full((L,), 1e-2, jnp.float32)
        return (p, s, s, g), lambda x, p, a, b, g: qmm.qmm_nvfp4(x, p, a, b, g)

    @reg("nvfp4p", O * K // 2)
    def build_nvfp4p():
        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 16), 1.0, jnp.float8_e4m3fn)
        g = jnp.full((L,), 1e-2, jnp.float32)
        pp, lo, hi = jax.vmap(qmm.nvfp4_perm_pack)(p, s, s)
        return (pp, lo, hi, g), lambda x, p, a, b, g: qmm.qmm_nvfp4_perm(x, p, a, b, g)

    @reg("nvfp4w", O * K // 2)
    def build_nvfp4w():
        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 16), 1.0, jnp.float8_e4m3fn)
        g = jnp.full((L,), 1e-2, jnp.float32)
        pw, sw = jax.vmap(lambda pp, aa, bb: qmm.nvfp4_word_pack(pp, aa, bb))(p, s, s)
        return (pw, sw, g), lambda x, p, s, g: qmm.qmm_nvfp4_word(x, p, s, g)

    @reg("nvfp4w_noperm", O * K // 2)
    def build_nvfp4w_noperm():
        # TIMING-ONLY variant: feeds x unpermuted (wrong numerics) to isolate
        # the cost of the per-call permute_k(x) XLA op.
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 16), 1.0, jnp.float8_e4m3fn)
        g = jnp.full((L,), 1e-2, jnp.float32)
        pw, sw = jax.vmap(lambda pp, aa, bb: qmm.nvfp4_word_pack(pp, aa, bb))(p, s, s)

        def call(x, packed_word, scales, global_scale):
            N, K_ = x.shape
            O_ = scales.shape[-2]
            tk = qmm._word_tile_k(K_, 16)
            gk, nblk = K_ // tk, tk // 16
            to = qmm._word_tile_o(O_)
            go = O_ // to
            gs2 = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
            kern = ft.partial(qmm._nvfp4_word_kernel, 16)
            return pl.pallas_call(
                kern,
                grid=(go, gk),
                in_specs=[
                    pl.BlockSpec((N, tk), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((to // 2, tk), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((to, nblk), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((N, to), lambda i, j: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, O_), x.dtype),
                scratch_shapes=[pltpu.VMEM((N, to), jnp.float32)],
                interpret=qmm._interpret(),
            )(x, packed_word, scales, gs2)

        return (pw, sw, g), call

    @reg("nvfp4_xla", O * K // 2)
    def build_nvfp4_xla():
        from tensorrt_model_optimizer_tpu.quant import compress

        p = stacked_u8(key, (L, O // 2, K))
        s = jnp.full((L, O // 2, K // 16), 1.0, jnp.float8_e4m3fn)
        g = jnp.full((L,), 1e-2, jnp.float32)

        def f(x, p, a, b, g):
            w = compress.decompress_weight(
                "nvfp4",
                {"packed": p, "scale_lo": a, "scale_hi": b, "global_scale": g},
            )
            return x @ w.T

        return (p, s, s, g), f

    class Probe:
        def __init__(self, name):
            # "fmt@O" runs fmt at an alternate output dim in the SAME
            # process — the only drift-proof way to get marginal GB/s
            global O
            fmt, O_saved = name, O
            if "@" in name:
                fmt, odim = name.split("@")
                O = int(odim)
            try:
                fn, bpl = builders[fmt]
                self.name = name
                self.bpl = bpl * O // O_saved  # bytes scale linearly in O
                ws, one = fn()
            finally:
                O = O_saved

            def step(x, ws):
                def body(x, wl):
                    y = one(x, *wl)
                    return (x + (y.sum(axis=1, keepdims=True) * 1e-6).astype(x.dtype)), ()

                x, _ = jax.lax.scan(body, x, ws)
                return x

            self.f = jax.jit(step)
            self.ws = ws
            t0 = time.time()
            r = self.f(x0, ws)
            np.asarray(r)
            log(f"{name}: compile+first {time.time() - t0:.1f}s")
            self.times = []

        def _timed(self, reps):
            x = x0
            t0 = time.time()
            for _ in range(reps):
                x = self.f(x, self.ws)
            np.asarray(x)
            return time.time() - t0

        def block(self):
            # slope timing: cancels the relay's per-readback constant
            t_lo = self._timed(REPS)
            t_hi = self._timed(3 * REPS)
            per_layer_us = (t_hi - t_lo) / (2 * REPS * L) * 1e6
            self.times.append(per_layer_us)

    probes = []
    for name in FORMATS:
        try:
            probes.append(Probe(name))
        except Exception as e:
            log(f"{name}: FAILED build/compile: {str(e)[:200]}")

    for r in range(ROUNDS):
        for p in probes:
            p.block()
        log(f"round {r + 1}: " + "  ".join(
            f"{p.name}={p.times[-1]:.0f}us" for p in probes))

    out = {}
    for p in probes:
        ts = sorted(p.times)
        med = ts[len(ts) // 2]
        out[p.name] = {
            "us_per_layer": round(med, 1),
            "GBps": round(p.bpl / (med * 1e-6) / 1e9, 1),
            "all": [round(t, 1) for t in p.times],
        }
        log(f"{p.name:10s} {med:8.1f} us/layer  {out[p.name]['GBps']:7.1f} GB/s")
    print(json.dumps({"B": B, "O": O, "K": K, "L": L, **out}))


if __name__ == "__main__":
    main()
