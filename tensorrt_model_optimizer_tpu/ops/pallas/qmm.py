"""Fused dequant-matmul Pallas kernels (the real-quant GEMM backends).

TPU-native equivalent of the reference's fused GEMM registry
(`modelopt/torch/quantization/backends/gemm_registry.py:31`,
`nvfp4_gemm.py:28`, `fp8_per_tensor_gemm.py:54`): y = x @ dequant(W)^T where
W stays packed in HBM and is dequantized tile-by-tile in VMEM on the way
into the MXU — the weight read is the decode-bandwidth bottleneck, so the
packed bytes are the only HBM traffic.

Layout contract (see `quant/compress.py`): 4-bit formats are *plane-packed*
byte[o, k] = nib(w[o + O/2, k]) << 4 | nib(w[o, k]); a tile dequantizes into
two contiguous half-outputs, no cross-lane interleave. Scales are stored
pre-split per plane.

Mosaic v5e notes: int8 vector compares are unsupported — nibble sign
extension uses the compare-free identity v = ((u ^ 8) - 8); all bit ops stay
in int32/uint8 where the target supports them.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes (empirically tuned on the v5e pool: tools/tune_qmm.py sweep —
# blockdot TO=256/TK=1024 = 7.5 us vs 9-12 us at TK=2048 for the int4 kernel)
TILE_O = 256
TILE_K = 1024


def pallas_supported() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _interpret() -> bool:
    return not pallas_supported()


def _grid_dims(O: int, K: int, tile_o: int, tile_k: int) -> tuple[int, int, int, int]:
    to = min(tile_o, O)
    tk = min(tile_k, K)
    while O % to:
        to //= 2
    while K % tk:
        tk //= 2
    return O // to, K // tk, to, tk


# --------------------------------------------------------------------------
# INT8 (per-out-channel scale)
# --------------------------------------------------------------------------


def _int8_kernel(x_ref, w_ref, s_ref, o_ref, acc):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    w = w_ref[:].astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (acc[:] * s_ref[:].T).astype(o_ref.dtype)


def qmm_int8(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x [N, K] bf16 @ dequant(q [O, K] int8, scale [O, 1])^T -> [N, O]."""
    N, K = x.shape
    O = q.shape[0]
    go, gk, to, tk = _grid_dims(O, K, TILE_O, TILE_K)
    return pl.pallas_call(
        _int8_kernel,
        grid=(go, gk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, to), jnp.float32)],
        interpret=_interpret(),
    )(x, q, scale.astype(jnp.float32))


# --------------------------------------------------------------------------
# FP8 E4M3 (per-tensor or per-channel scale)
# --------------------------------------------------------------------------


def _fp8_kernel(x_ref, w_ref, s_ref, o_ref, acc):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    w = w_ref[:].astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (acc[:] * s_ref[:].T).astype(o_ref.dtype)


def qmm_fp8(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x [N, K] @ (q [O, K] e4m3 * scale)^T. scale: scalar or [O, 1]."""
    N, K = x.shape
    O = q.shape[0]
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32).reshape(-1, 1), (O, 1))
    go, gk, to, tk = _grid_dims(O, K, TILE_O, TILE_K)
    return pl.pallas_call(
        _fp8_kernel,
        grid=(go, gk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, to), jnp.float32)],
        interpret=_interpret(),
    )(x, q, scale)


# --------------------------------------------------------------------------
# INT4 plane-packed, per-(row, K-block) scales
# --------------------------------------------------------------------------


def _unpack_nibbles_bf16(p):
    """uint8 plane tile -> (lo, hi) bf16 signed values, compare-free."""
    p32 = p.astype(jnp.int32)
    lo = (((p32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
    hi = ((((p32 >> 4) & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
    return lo, hi


def _int4_kernel(nblk, x_ref, w_ref, sl_ref, sh_ref, lo_ref, hi_ref, accl, acch):
    # Scales come in TRANSPOSED per-tile blocks [nblk, TO] so the grid
    # slices them statically (Mosaic wants last-dim tiles of 128 / full).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accl[:] = jnp.zeros_like(accl)
        acch[:] = jnp.zeros_like(acch)

    lo, hi = _unpack_nibbles_bf16(w_ref[:])
    tk = lo.shape[1]
    bsz = tk // nblk
    # Per-block scales applied via block-partial dots: the MXU does the
    # contraction per K-block and the [N, TO] partial picks up scale[blk]
    # — no elementwise multiply over the big weight tile.
    for b in range(nblk):
        xs = x_ref[:, b * bsz : (b + 1) * bsz]
        accl[:] += jax.lax.dot_general(
            xs, lo[:, b * bsz : (b + 1) * bsz],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sl_ref[b, :].astype(jnp.float32)[None, :]
        acch[:] += jax.lax.dot_general(
            xs, hi[:, b * bsz : (b + 1) * bsz],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sh_ref[b, :].astype(jnp.float32)[None, :]

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        lo_ref[:] = accl[:].astype(lo_ref.dtype)
        hi_ref[:] = acch[:].astype(hi_ref.dtype)


def qmm_int4(
    x: jax.Array,
    packed: jax.Array,  # [O/2, K] uint8 planes
    scale_lo: jax.Array,  # [O/2, K/bsz] f32
    scale_hi: jax.Array,
) -> jax.Array:
    N, K = x.shape
    O2 = packed.shape[0]
    nb_total = scale_lo.shape[1]
    bsz = K // nb_total
    go, gk, to, tk = _grid_dims(O2, K, TILE_O, TILE_K)
    if tk % bsz:
        tk = bsz
        gk = K // tk
    nblk = tk // bsz
    kern = functools.partial(_int4_kernel, nblk)
    sl_t = scale_lo.astype(jnp.float32).T  # [nb_total, O2]
    sh_t = scale_hi.astype(jnp.float32).T
    lo, hi = pl.pallas_call(
        kern,
        grid=(go, gk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, to), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, to), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, O2), x.dtype),
            jax.ShapeDtypeStruct((N, O2), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, to), jnp.float32),
            pltpu.VMEM((N, to), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, packed, sl_t, sh_t)
    return jnp.concatenate([lo, hi], axis=1)


# --------------------------------------------------------------------------
# NVFP4 plane-packed E2M1 codes, per-(row, 16-block) E4M3 scales x global
# --------------------------------------------------------------------------


def _fp4_decode_bf16(nib32):
    """4-bit E2M1 code (int32 lanes) -> value as f32, compare-free-ish.

    code = s m2 m1 m0; idx = code & 7; for idx >= 2:
    mag = ldexp((2 + (idx & 1)) * 0.25, idx >> 1); idx==1 -> 0.5; idx==0 -> 0.
    """
    idx = nib32 & 7
    sign = jnp.where((nib32 & 8) != 0, -1.0, 1.0).astype(jnp.float32)
    base = (2 + (idx & 1)).astype(jnp.float32) * 0.25
    mag = jnp.ldexp(base, idx >> 1)
    mag = jnp.where(idx == 1, 0.5, mag)
    mag = jnp.where(idx == 0, 0.0, mag)
    return sign * mag


def _nvfp4_kernel(nblk, x_ref, w_ref, sl_ref, sh_ref, gs_ref, lo_ref, hi_ref, accl, acch):
    # Block-partial-dot strategy (scales transposed [nblk, TO], statically
    # sliced per grid step). NOTE a faster elementwise variant needs a
    # K-permuted pack layout: pltpu.repeat TILES its input (s0 s1 .. s0 s1)
    # rather than element-repeating, so scales only align if block index
    # varies fastest along K — round-2 layout change (see memory notes).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accl[:] = jnp.zeros_like(accl)
        acch[:] = jnp.zeros_like(acch)

    p32 = w_ref[:].astype(jnp.int32)
    lo = _fp4_decode_bf16(p32 & 0xF).astype(jnp.bfloat16)
    hi = _fp4_decode_bf16((p32 >> 4) & 0xF).astype(jnp.bfloat16)
    tk = lo.shape[1]
    bsz = tk // nblk
    for b in range(nblk):
        xs = x_ref[:, b * bsz : (b + 1) * bsz]
        accl[:] += jax.lax.dot_general(
            xs, lo[:, b * bsz : (b + 1) * bsz],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sl_ref[b, :].astype(jnp.float32)[None, :]
        acch[:] += jax.lax.dot_general(
            xs, hi[:, b * bsz : (b + 1) * bsz],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sh_ref[b, :].astype(jnp.float32)[None, :]

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        gs = gs_ref[0, 0]
        lo_ref[:] = (accl[:] * gs).astype(lo_ref.dtype)
        hi_ref[:] = (acch[:] * gs).astype(hi_ref.dtype)


def qmm_nvfp4(
    x: jax.Array,
    packed: jax.Array,  # [O/2, K] uint8 code planes
    scale_lo: jax.Array,  # [O/2, K/16] e4m3
    scale_hi: jax.Array,
    global_scale: jax.Array,  # scalar f32
    block_size: int = 16,
) -> jax.Array:
    """NVFP4 fused dequant matmul.

    NOTE: with block_size 16 the per-block partial dots are 16-deep — MXU
    underutilized but still HBM-bound at decode batch sizes. A packed-scale
    variant (scales pre-multiplied into a bf16 tile) is the planned upgrade.
    """
    N, K = x.shape
    O2 = packed.shape[0]
    nb_total = scale_lo.shape[1]
    bsz = K // nb_total
    go, gk, to, tk = _grid_dims(O2, K, TILE_O, TILE_K)
    if tk % bsz:
        tk = bsz
        gk = K // tk
    # nvfp4 prefers larger K tiles than int4 (16-wide blocks -> many partial
    # dots; 2048 measured best: tools/tune_qmm.py)
    if K % 2048 == 0:
        tk = 2048
        gk = K // tk
    nblk = tk // bsz
    kern = functools.partial(_nvfp4_kernel, nblk)
    gs2 = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    sl_t = scale_lo.astype(jnp.float32).T  # [nb_total, O2]
    sh_t = scale_hi.astype(jnp.float32).T
    lo, hi = pl.pallas_call(
        kern,
        grid=(go, gk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, to), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, to), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, O2), x.dtype),
            jax.ShapeDtypeStruct((N, O2), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, to), jnp.float32),
            pltpu.VMEM((N, to), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, packed, sl_t, sh_t, gs2)
    return jnp.concatenate([lo, hi], axis=1)


# --------------------------------------------------------------------------
# Dispatch
# --------------------------------------------------------------------------


def quantized_matmul(x: jax.Array, kind: str, arrays: dict) -> jax.Array:
    """y = x @ dequant(W)^T for a packed weight dict (see quant/compress.py).

    Per-format backend choice is empirical (same-run A/B on the target):
    int8 goes through XLA's own dequant+dot fusion (7.6 us vs 9.8 us for the
    hand-written kernel at llama-8B shapes); fp8/int4/nvfp4 use the Pallas
    kernels (XLA can't consume the packed layouts).
    """
    if kind == "int8":
        w = (arrays["q"].astype(jnp.bfloat16) * arrays["scale"].astype(jnp.bfloat16))
        return x @ w.T.astype(x.dtype)
    if kind == "fp8":
        return qmm_fp8(x, arrays["q"], arrays["scale"])
    if kind == "int4":
        return qmm_int4(x, arrays["packed"], arrays["scale_lo"], arrays["scale_hi"])
    if kind == "nvfp4":
        sl = arrays["scale_lo"].astype(jnp.float32)
        sh = arrays["scale_hi"].astype(jnp.float32)
        return qmm_nvfp4(x, arrays["packed"], sl, sh, arrays["global_scale"])
    if kind == "bf16":
        return x @ arrays["w"].T.astype(x.dtype)
    raise ValueError(f"unknown kind {kind!r}")
