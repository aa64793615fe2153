#!/usr/bin/env python
"""Round-3 kernel-optimization probe: where do nvfp4_word2's extra us go?

Same-session A/B of experimental nvfp4/int4 decode-kernel variants at the
llama-8B gate-proj shape (BS8 decode). Round-3 item #1 (VERDICT): int4_bd2
measured 113 us (1.43x bf16's 162), nvfp4_word2 177 us (0.92x) — target is
both >= 1.7x, i.e. ~95 us. Hypotheses probed here:

 1. **MXU column waste**: word2 group dots emit [N, TO/4] with TO=256 ->
    64-wide outputs on a 128-lane MXU. TO=512 makes each group dot
    128-wide. (variants *_to512)
 2. **int32 multiply cost**: the zero-patch mask uses `zm * 0x0FF8`; VPU
    int32 multiply may lower to multiple ops. Replace with
    (zm<<12) - (zm<<3), SWAR-safe. (nvfp4w2_nomul)
 3. **Attribution**: strip the scale multiply / zero patch / sign (WRONG
    NUMERICS, timing only) to cost each decode stage. (noscale, nozero)
 4. **Merged dot**: decode all 4 groups into one [TO, TK] scratch then one
    full-width dot, vs 4 quarter-width dots. (merged)
 5. bd2 at TO=512 for the same MXU-width reason. (int4bd2_to512)

Usage: python tools/probe_qmm_opt.py [BS]   (prints one JSON line)
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrt_model_optimizer_tpu.ops.pallas import qmm

O, K = 14336, 4096
ITERS = 16


# ---------------------------------------------------------------------------
# experimental nvfp4 word2 kernel, parameterized
# ---------------------------------------------------------------------------


def _nvfp4_w2_kernel(rep, mode, x_ref, w_ref, s_ref, gs_ref, o_ref, acc, *scr):
    j = pl.program_id(2)
    to4 = s_ref.shape[0] // 4

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]
    x = x_ref[:]
    ws = []
    for g in range(4):
        n = (p >> (4 * g) if g else p) & 0x000F000F
        m = n & 0x00070007
        bits = (m + 0x00FC00FC) << 6
        if mode != "nozero":
            if mode in ("nomul", "merged", "to512"):
                zm = ((m ^ 0x00010001) + 0x00070007) & 0x00080008
                bits = bits & ((zm << 12) - (zm << 3))
            else:  # baseline: int multiply
                zm = ((m ^ 0x00010001) + 0x00070007) & 0x00080008
                bits = bits & (zm * 0x0FF8)
        bits = bits | ((n & 0x00080008) << 12)
        w = pltpu.bitcast(bits, jnp.bfloat16)
        if mode != "noscale":
            s_full = pltpu.repeat(s_ref[g * to4 : (g + 1) * to4, :], rep, axis=1)
            w = w * s_full
        if mode == "merged":
            ws.append(w)
            continue
        acc[:, g * to4 : (g + 1) * to4] += jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    if mode == "merged":
        scr[0][:] = jnp.concatenate(ws, axis=0)
        acc[:] += jax.lax.dot_general(
            x, scr[0][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc[:] * gs_ref[0, 0]).astype(o_ref.dtype)


def qmm_nvfp4_w2_x(x, packed_w2, scales, global_scale, mode, tile_o,
                   block_size=16, semantics=None):
    N, Kx = x.shape
    Ox = scales.shape[-2]
    bsz = Kx // scales.shape[-1]
    tk = qmm._word_tile_k(Kx, block_size)
    gk = Kx // tk
    nblk = tk // bsz
    to = tile_o
    go = Ox // to
    tn = qmm._word_tile_n(N)
    gn = N // tn
    xp = qmm.permute_k(x, 1, tk, bsz=block_size)
    gs2 = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    kern = functools.partial(_nvfp4_w2_kernel, bsz, mode)
    scratch = [pltpu.VMEM((tn, to), jnp.float32)]
    if mode == "merged":
        scratch.append(pltpu.VMEM((to, tk), jnp.bfloat16))
    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics)
    return pl.pallas_call(
        kern,
        grid=(gn, go, gk),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda n, i, j: (n, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to // 8, tk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, nblk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda n, i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Ox), x.dtype),
        scratch_shapes=scratch,
        interpret=qmm._interpret(),
        **params,
    )(xp, packed_w2, scales, gs2)


def _pack_w2_at(packed, sl, sh, tile_o, block_size=16):
    """nvfp4_word2_pack with an explicit O-tile (pack/matmul must agree)."""
    O2, Kx = packed.shape[-2:]
    tk = qmm._word_tile_k(Kx, block_size)
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2).astype(jnp.int32)
    m = codes & 7
    codes = (codes & 8) | (m ^ (m < 2).astype(jnp.int32))
    scales = jnp.concatenate([sl, sh], axis=-2).astype(jnp.float32).astype(jnp.bfloat16)
    word = qmm._word2_byte_pack(codes, tile_o)
    return qmm.permute_k(word, -1, tk, bsz=block_size), scales


def _pack_int4_w2_at(packed, sl, sh, tile_o):
    O2, Kx = packed.shape[-2:]
    bsz = Kx // sl.shape[-1]
    tk = qmm._word_tile_k(Kx, bsz)
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2).astype(jnp.int32) ^ 8
    scales = jnp.concatenate([sl, sh], axis=-2).astype(jnp.float32).astype(jnp.bfloat16)
    word = qmm._word2_byte_pack(codes, tile_o)
    return qmm.permute_k(word, -1, tk, bsz=bsz), scales


def _int4_w2_kernel_x(rep, x_ref, w_ref, s_ref, o_ref, acc):
    j = pl.program_id(2)
    to4 = s_ref.shape[0] // 4

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]
    x = x_ref[:]
    for g in range(4):
        bits = ((p >> (4 * g) if g else p) & 0x000F000F) | 0x43004300
        w = pltpu.bitcast(bits, jnp.bfloat16)
        s_full = pltpu.repeat(s_ref[g * to4 : (g + 1) * to4, :], rep, axis=1)
        w = (w - jnp.bfloat16(136.0)) * s_full
        acc[:, g * to4 : (g + 1) * to4] += jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def qmm_int4_w2_x(x, packed_w2, scales, tile_o):
    N, Kx = x.shape
    Ox = scales.shape[-2]
    bsz = Kx // scales.shape[-1]
    tk = qmm._word_tile_k(Kx, bsz)
    gk = Kx // tk
    nblk = tk // bsz
    to = tile_o
    go = Ox // to
    tn = qmm._word_tile_n(N)
    gn = N // tn
    xp = qmm.permute_k(x, 1, tk, bsz=bsz)
    kern = functools.partial(_int4_w2_kernel_x, bsz)
    return pl.pallas_call(
        kern,
        grid=(gn, go, gk),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda n, i, j: (n, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to // 8, tk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, nblk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Ox), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=qmm._interpret(),
    )(xp, packed_w2, scales)


def _pack_bd2_at(packed, sl, sh, tile_o):
    O2, Kx = packed.shape[-2:]
    Ofull = 2 * O2
    bsz = Kx // sl.shape[-1]
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2).astype(jnp.int32) ^ 8
    scalesT = jnp.swapaxes(
        jnp.concatenate([sl, sh], axis=-2).astype(jnp.float32).astype(jnp.bfloat16),
        -1, -2)
    word = qmm._word2_byte_pack(codes, tile_o).reshape(Ofull // 8, Kx // bsz, bsz)
    return word.transpose(1, 0, 2), scalesT


def qmm_int4_bd2_x(x, packed_bd2, scalesT, tile_o):
    N, Kx = x.shape
    Ox = scalesT.shape[-1]
    nblk_total = scalesT.shape[-2]
    bsz = Kx // nblk_total
    tk = qmm._bd2_tile_k(Kx, bsz)
    gk = Kx // tk
    nblk = tk // bsz
    to = tile_o
    go = Ox // to
    tn = qmm._word_tile_n(N)
    gn = N // tn
    x3 = jnp.swapaxes(x.reshape(N, nblk_total, bsz), 0, 1)
    xs = jnp.sum(x3.astype(jnp.float32), axis=-1)
    return pl.pallas_call(
        qmm._int4_bd2_kernel,
        grid=(gn, go, gk),
        in_specs=[
            pl.BlockSpec((nblk, tn, bsz), lambda n, i, j: (j, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, to // 8, bsz), lambda n, i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, to), lambda n, i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, tn), lambda n, i, j: (j, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Ox), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=qmm._interpret(),
    )(x3, packed_bd2, scalesT, xs)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    results = {}

    def chain(fn_one):
        def run(x, *ws):
            def body(i, x):
                y = fn_one(x, *ws)
                return x + (y[:, :1] * 1e-6).astype(x.dtype)
            return jax.lax.fori_loop(0, ITERS, body, x)
        return jax.jit(run)

    def measure(name, fn_one, weight_bytes, *ws, rounds=5):
        try:
            f = chain(fn_one)
            _ = np.asarray(f(x0, *ws))  # compile + first
            ts = []
            for _r in range(rounds):
                t0 = time.time()
                _ = np.asarray(f(x0, *ws))
                ts.append((time.time() - t0) / ITERS)
            dt = sorted(ts)[len(ts) // 2]
            gbs = weight_bytes / dt / 1e9
            results[name] = {"us": round(dt * 1e6, 1), "GBps": round(gbs, 1)}
            print(f"{name:24s} {dt*1e6:9.1f} us  {gbs:8.1f} GB/s",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"{name:24s} FAIL {str(e)[:200]}", file=sys.stderr, flush=True)

    wb = O * K // 2  # packed 4-bit bytes

    Wb = jnp.asarray(rng.normal(size=(O, K)) * 0.02, jnp.bfloat16)
    measure("bf16_xla", lambda x, w: x @ w.T, O * K * 2, Wb)

    Wp = jnp.asarray(rng.integers(0, 256, size=(O // 2, K), dtype=np.uint8))
    slf4 = jnp.full((O // 2, K // 16), 1.0, jnp.float32)
    gs = jnp.asarray(1e-3, jnp.float32)
    sl = jnp.full((O // 2, K // 128), 1e-3, jnp.float32)

    # --- current production kernels (baselines) ---
    W2, S2 = qmm.nvfp4_word2_pack(Wp, slf4, slf4)
    measure("nvfp4w2_to256", lambda x, w, s, g: qmm.qmm_nvfp4_word2(x, w, s, g),
            wb, W2, S2, gs)
    Wb2, Sb2 = qmm.int4_bd2_pack(Wp, sl, sl)
    measure("int4bd2_to256", lambda x, w, s: qmm.qmm_int4_bd2(x, w, s),
            wb, Wb2, Sb2)
    Wi2, Si2 = qmm.int4_word2_pack(Wp, sl, sl)
    measure("int4w2_to256", lambda x, w, s: qmm.qmm_int4_word2(x, w, s),
            wb, Wi2, Si2)

    # --- hypothesis 1: TO=512 / TO=1024 (full-width group dots) ---
    for to in (512, 1024):
        W2t, S2t = _pack_w2_at(Wp, slf4, slf4, to)
        measure(f"nvfp4w2_to{to}",
                lambda x, w, s, g, to=to: qmm_nvfp4_w2_x(x, w, s, g, "base", to),
                wb, W2t, S2t, gs)
    W2t512, S2t512 = _pack_w2_at(Wp, slf4, slf4, 512)

    # --- hypothesis 2: mul-free zero mask (at 512) ---
    measure("nvfp4w2_nomul512",
            lambda x, w, s, g: qmm_nvfp4_w2_x(x, w, s, g, "to512", 512),
            wb, W2t512, S2t512, gs)

    # --- hypothesis 3: attribution (WRONG numerics, timing only) ---
    measure("nvfp4w2_noscale512",
            lambda x, w, s, g: qmm_nvfp4_w2_x(x, w, s, g, "noscale", 512),
            wb, W2t512, S2t512, gs)
    measure("nvfp4w2_nozero512",
            lambda x, w, s, g: qmm_nvfp4_w2_x(x, w, s, g, "nozero", 512),
            wb, W2t512, S2t512, gs)

    # --- hypothesis 4: merged single dot (at 256 and 512) ---
    for to in (256, 512):
        W2t, S2t = _pack_w2_at(Wp, slf4, slf4, to)
        measure(f"nvfp4w2_merged{to}",
                lambda x, w, s, g, to=to: qmm_nvfp4_w2_x(x, w, s, g, "merged", to),
                wb, W2t, S2t, gs)

    # --- semantics hint on the best structural variant ---
    measure("nvfp4w2_sem512",
            lambda x, w, s, g: qmm_nvfp4_w2_x(
                x, w, s, g, "to512", 512,
                semantics=("arbitrary", "arbitrary", "arbitrary")),
            wb, W2t512, S2t512, gs)

    # --- int4 counterparts at 512 ---
    Wi2t, Si2t = _pack_int4_w2_at(Wp, sl, sl, 512)
    measure("int4w2_to512", lambda x, w, s: qmm_int4_w2_x(x, w, s, 512),
            wb, Wi2t, Si2t)
    for to in (512, 1024):
        Wb2t, Sb2t = _pack_bd2_at(Wp, sl, sl, to)
        measure(f"int4bd2_to{to}",
                lambda x, w, s, to=to: qmm_int4_bd2_x(x, w, s, to),
                wb, Wb2t, Sb2t)

    print(json.dumps({"bs": B, "shape": [O, K], **results}))


if __name__ == "__main__":
    main()
