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
import os
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
# NVFP4, K-permuted layout: exact-bf16 elementwise scales + full-depth dots
# --------------------------------------------------------------------------
#
# The blockdot kernel above issues 2*nblk depth-16 partial dots per tile —
# MXU-latency bound. This variant permutes lanes inside each K tile to
# block-index-fastest order (old lane b*16+p -> new lane p*nblk+b), so the
# per-block E4M3 scales expand to a full [TO, TK] tile with a single
# pltpu.repeat (which concatenates WHOLE copies: s0..s_{nblk-1} repeated —
# exactly the permuted layout's scale pattern). Scales multiply into the
# decoded values elementwise (E2M1 value x E4M3 scale has <= 6 significand
# bits — exact in bf16), then ONE full-depth dot per plane per tile.
# Activations get the same static lane permutation (a reshape-transpose,
# fused by XLA); x_perm @ w_perm^T == x @ w^T.


def nvfp4_perm_tile(K: int) -> int:
    """K-tile used by the permuted layout (keep in sync pack <-> matmul)."""
    return 2048 if K % 2048 == 0 else K


def permute_k(a: jax.Array, K_axis: int, tk: int, bsz: int = 16) -> jax.Array:
    """Reorder lanes within each tk-sized K tile: b*bsz+p -> p*nblk+b."""
    nblk = tk // bsz
    shape = a.shape
    K = shape[K_axis]
    a = jnp.moveaxis(a, K_axis, -1)
    lead = a.shape[:-1]
    a = a.reshape(lead + (K // tk, nblk, bsz))
    a = jnp.swapaxes(a, -1, -2).reshape(lead + (K,))
    return jnp.moveaxis(a, -1, K_axis)


def unpermute_k(a: jax.Array, K_axis: int, tk: int, bsz: int = 16) -> jax.Array:
    """Inverse of permute_k (swap the roles of bsz and nblk)."""
    nblk = tk // bsz
    K = a.shape[K_axis]
    a = jnp.moveaxis(a, K_axis, -1)
    lead = a.shape[:-1]
    a = a.reshape(lead + (K // tk, bsz, nblk))
    a = jnp.swapaxes(a, -1, -2).reshape(lead + (K,))
    return jnp.moveaxis(a, -1, K_axis)


def _nvfp4_perm_kernel(rep, x_ref, w_ref, sl_ref, sh_ref, gs_ref,
                       lo_ref, hi_ref, accl, acch):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accl[:] = jnp.zeros_like(accl)
        acch[:] = jnp.zeros_like(acch)

    p32 = w_ref[:].astype(jnp.int32)
    # bf16 throughout: E2M1 value x E4M3 scale has <= 6 significand bits,
    # exact in bf16 — and halves VMEM vs f32 intermediates.
    sl_full = pltpu.repeat(sl_ref[:], rep, axis=1)  # [TO, TK], tiled copies
    sh_full = pltpu.repeat(sh_ref[:], rep, axis=1)
    lo = _fp4_decode_bf16(p32 & 0xF).astype(jnp.bfloat16) * sl_full
    hi = _fp4_decode_bf16((p32 >> 4) & 0xF).astype(jnp.bfloat16) * sh_full
    x = x_ref[:]
    accl[:] += jax.lax.dot_general(
        x, lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    acch[:] += jax.lax.dot_general(
        x, hi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        gs = gs_ref[0, 0]
        lo_ref[:] = (accl[:] * gs).astype(lo_ref.dtype)
        hi_ref[:] = (acch[:] * gs).astype(hi_ref.dtype)


def nvfp4_perm_pack(packed: jax.Array, scale_lo: jax.Array, scale_hi: jax.Array):
    """One-time layout conversion: permute packed lanes tile-wise.

    Scales stay in [O/2, K/16] block order (the kernel reads them per-tile
    as [TO, nblk] and tiles them across lanes). Returns (packed_perm, sl_f32,
    sh_f32)."""
    K = packed.shape[1]
    tk = nvfp4_perm_tile(K)
    return (permute_k(packed, 1, tk),
            scale_lo.astype(jnp.float32).astype(jnp.bfloat16),
            scale_hi.astype(jnp.float32).astype(jnp.bfloat16))


def qmm_nvfp4_perm(
    x: jax.Array,
    packed_perm: jax.Array,  # [O/2, K] uint8, K-permuted
    scale_lo: jax.Array,  # [O/2, K/16] f32
    scale_hi: jax.Array,
    global_scale: jax.Array,
    block_size: int = 16,
    tile_o: int = 128,
) -> jax.Array:
    N, K = x.shape
    O2 = packed_perm.shape[0]
    tk = nvfp4_perm_tile(K)
    gk = K // tk
    nblk = tk // block_size
    to = min(tile_o, O2)  # 128 default: keeps decode+scale tiles in VMEM
    while O2 % to:
        to //= 2
    go = O2 // to
    xp = permute_k(x, 1, tk)
    gs2 = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    kern = functools.partial(_nvfp4_perm_kernel, block_size)
    lo, hi = pl.pallas_call(
        kern,
        grid=(go, gk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, nblk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, nblk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
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
    )(xp, packed_perm, scale_lo, scale_hi, gs2)
    return jnp.concatenate([lo, hi], axis=1)


# --------------------------------------------------------------------------
# NVFP4, word-domain decode: row-pair packing + SWAR bf16-bit construction
# --------------------------------------------------------------------------
#
# The perm kernel still spends ~16 VPU ops per weight element in
# `_fp4_decode_bf16` (sign select, ldexp, two subnormal selects, f32->bf16
# convert). This variant halves the elementwise work by decoding BOTH
# nibbles of a byte with every ALU op (SWAR on the two 16-bit halves of an
# int32 lane) and writing finished *bf16 bit patterns* directly:
#
#  - bytes pack two adjacent OUTPUT rows at the same k:
#    byte[r, k] = code(W[2r, k]) | code(W[2r+1, k]) << 4
#  - E2M1 -> bf16 bits is affine in the code for idx >= 2:
#    bits = (idx + 252) << 6   (exact: 1.0=0x3F80 ... 6.0=0x40C0);
#    idx < 2 patches to (idx & 1) * 0x3F00 via a compare-free SWAR mask
#  - one int32 lane ends up holding the two rows' bf16 patterns;
#    pltpu.bitcast(i32 -> bf16) doubles the SUBLANE dim, restoring the
#    [TO, TK] tile (row order discovered once at runtime by _bitcast_order)
#  - K lanes are tile-permuted exactly like the perm variant so the block
#    scales expand with one pltpu.repeat; ONE full-depth dot per tile.
#
# Net: ~8 VPU ops/element vs ~16, one dot and one output instead of two.
# Reference numerics contract: `nvfp4_quant.py:18-49` (same as qmm_nvfp4).


# O-tile for the word/word2/bd2 layouts. Env-overridable (QMM_TILE_O) as an
# on-chip tuning knob: bigger tiles cut grid-cell count (the bd2 engine step
# runs ~10k cells at ~1.8 us/cell — r04 A/B) at the cost of VMEM. Pack and
# kernel derive the tile from the same value, so set it process-wide BEFORE
# engine init; packed artifacts are tile-size-specific.
# Default 512 since the r04 tile sweep: int4 bd2 1.505x -> 1.659x and nvfp4
# word2 1.083x -> 1.157x chip-normalized bf16 at 8B BS8
# (artifacts/bench_r04/engine_*_to512.json).
WORD_TILE_O = int(os.environ.get("QMM_TILE_O", "512"))


def _word_tile_k(K: int, bsz: int) -> int:
    """K-tile for the word kernels. The per-tile scale block [TO, tk/bsz]
    needs a Mosaic-legal last dim: multiple of 128, or the FULL scale dim —
    fall back to one whole-K tile when the 2048 default would violate that
    (int4's 128-wide blocks give only 16 scales per 2048-lane tile)."""
    tk = nvfp4_perm_tile(K)
    if (tk // bsz) % 128 and tk != K:
        tk = K
    return tk


def _word_tile_o(O: int) -> int:
    """O-tile shared by pack and matmul (split bitcast order pairs rows
    within a tile, so both sides must agree)."""
    to = min(WORD_TILE_O, O)
    while O % to or to % 2:
        to //= 2
    return to


def _word_tile_n(N: int) -> int:
    """N (row) tile for the word kernels. Decode (N<=256) runs one tile;
    prefill rows are tiled so the fp32 accumulator + out tile stay inside
    the 16 MB scoped-vmem budget (int4's 128-wide scale blocks force a
    whole-K tile, and an untiled N=1024 prefill hit a 33.4 MB vmem stack
    OOM on-chip, 2026-08-18). Tiles must keep the sublane dim Mosaic-legal
    (multiple of 8) — fall back to one whole-N tile if N doesn't split."""
    if N <= 256:
        return N
    tn = 256
    while N % tn or tn % 8:
        tn //= 2
        if tn < 8:
            return N
    return tn


@functools.cache
def _bitcast_order() -> str:
    """How pltpu.bitcast(i32 -> bf16) orders the doubled sublanes.

    Returns "interleaved" (row r -> rows 2r/2r+1, low half first) or
    "split" (low halves rows [0, R), high halves rows [R, 2R)). Probed once
    on the live backend with a tiny kernel — the Mosaic lowering is not
    documented and interpret mode may differ from hardware."""
    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.bfloat16)

    x = jnp.full((8, 128), 0x3F803F00, jnp.int32)  # low=0.5, high=1.0
    probe = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
        interpret=_interpret(),
    )(x)
    row0 = float(probe[0, 0].astype(jnp.float32))
    row1 = float(probe[1, 0].astype(jnp.float32))
    row8 = float(probe[8, 0].astype(jnp.float32))
    if row0 == 0.5 and row1 == 1.0:
        return "interleaved"
    if row0 == 0.5 and row8 == 1.0:
        return "split"
    raise RuntimeError(
        f"unrecognized pltpu.bitcast sublane order: {row0}, {row1}, {row8}")


def _nvfp4_word_kernel(rep, x_ref, w_ref, s_ref, gs_ref, o_ref, acc):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:].astype(jnp.int32)  # [TO/2, TK] one byte = two output rows
    # SWAR: position the two nibbles in the two 16-bit halves, then every
    # op below decodes both elements at once (compare-free throughout).
    # 17 int32 ops per byte-pair: p<<12 puts the high nibble at bits 16-19
    # in one shift; idx>=2 becomes bit 3 of (idx+6) with no carry across
    # halves (max 13); *0x1FF8 expands that bit to a 0xFFC0 half-mask,
    # exactly covering bits 6-15 where norm/sub live; xor-select combines.
    spread = (p | (p << 12)) & 0x000F000F
    idx = spread & 0x00070007
    norm = (idx + 0x00FC00FC) << 6          # (idx + 252) << 6, both halves
    sub = (spread & 0x00010001) * 0x3F00    # 0 / 0.5 for idx < 2
    mask = ((idx + 0x00060006) & 0x00080008) * 0x1FF8  # 0xFFC0 iff idx >= 2
    bits = sub ^ ((norm ^ sub) & mask)
    bits = bits | ((spread & 0x00080008) << 12)   # sign -> bf16 bit 15
    w = pltpu.bitcast(bits, jnp.bfloat16)   # [TO, TK]
    s_full = pltpu.repeat(s_ref[:], rep, axis=1)  # [TO, TK] (perm layout)
    w = w * s_full
    acc[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc[:] * gs_ref[0, 0]).astype(o_ref.dtype)


def nvfp4_word_pack(
    packed: jax.Array,     # [O/2, K] plane-packed uint8 (compress.py layout)
    scale_lo: jax.Array,   # [O/2, K/bsz]
    scale_hi: jax.Array,
    block_size: int = 16,
):
    """Plane layout -> word layout: row-pair bytes (order per the runtime
    bitcast probe), K-lane tile permutation, row-ordered bf16 scales.

    `block_size` must match the matmul's (16 for NVFP4, 32 for MXFP4 —
    the lane permutation and K tile depend on it).

    Returns (packed_word [O/2, K], scales [O, K/bsz])."""
    O2, K = packed.shape[-2:]
    tk = _word_tile_k(K, block_size)
    lo_codes = packed & 0xF          # rows [0, O/2)
    hi_codes = packed >> 4           # rows [O/2, O)
    codes = jnp.concatenate([lo_codes, hi_codes], axis=-2)  # [O, K] row order
    scales = jnp.concatenate(
        [scale_lo, scale_hi], axis=-2
    ).astype(jnp.float32).astype(jnp.bfloat16)  # [O, K/16]
    if _bitcast_order() == "interleaved":
        even = codes[..., 0::2, :]
        odd = codes[..., 1::2, :]
    else:  # split: kernel-tile rows [0, TO/2) come from low halves — pack
        # per O-tile so byte row i pairs rows i and i + TO/2 within the tile
        to = _word_tile_o(2 * O2)
        lead = codes.shape[:-2]
        ct = codes.reshape(lead + (codes.shape[-2] // to, to, K))
        even = ct[..., : to // 2, :].reshape(lead + (O2, K))
        odd = ct[..., to // 2 :, :].reshape(lead + (O2, K))
    word = (even | (odd << 4)).astype(jnp.uint8)
    return permute_k(word, -1, tk, bsz=block_size), scales


def qmm_nvfp4_word(
    x: jax.Array,
    packed_word: jax.Array,  # [O/2, K] uint8 row-pair bytes, K-permuted
    scales: jax.Array,       # [O, K/16] bf16, natural row order
    global_scale: jax.Array,
    block_size: int = 16,
) -> jax.Array:
    N, K = x.shape
    O = scales.shape[-2]
    tk = _word_tile_k(K, block_size)
    gk = K // tk
    nblk = tk // block_size
    to = _word_tile_o(O)
    go = O // to
    tn = _word_tile_n(N)
    gn = N // tn
    xp = permute_k(x, 1, tk, bsz=block_size)
    gs2 = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    kern = functools.partial(_nvfp4_word_kernel, block_size)
    return pl.pallas_call(
        kern,
        grid=(gn, go, gk),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda n, i, j: (n, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to // 2, tk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, nblk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda n, i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=_interpret(),
    )(xp, packed_word, scales, gs2)


# --------------------------------------------------------------------------
# INT4, word-domain decode: magic-number bf16 construction
# --------------------------------------------------------------------------
#
# Same row-pair/SWAR structure as qmm_nvfp4_word, but int4 decode collapses
# to ONE add: bf16(128 + u) has bit pattern 0x4300 + u exactly for
# u in [0, 128) (exponent 7 puts the integer in the low mantissa bits), so
#   bits = 0x43004300 + spread(nibbles)   ->  bitcast  ->  w - 136.0
# yields the signed value (u - 8) with two elements per ALU op. The 136
# offset folds the usual (u ^ 8) - 8 sign trick into the float domain.


def _int4_word_kernel(rep, x_ref, w_ref, s_ref, o_ref, acc):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:].astype(jnp.int32)  # [TO/2, TK]
    spread = (p | (p << 12)) & 0x000F000F
    # two's-complement nibble -> biased: u = code ^ 8 (so u - 8 = value)
    bits = (spread ^ 0x00080008) + 0x43004300  # bf16(128 + u) in both halves
    w = pltpu.bitcast(bits, jnp.bfloat16)   # [TO, TK]
    w = w - jnp.bfloat16(136.0)             # (128 + u) - 136 = u - 8, exact
    s_full = pltpu.repeat(s_ref[:], rep, axis=1)  # [TO, TK]
    acc[:] += jax.lax.dot_general(
        x_ref[:], w * s_full, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def int4_word_pack(
    packed: jax.Array,     # [O/2, K] plane-packed uint8
    scale_lo: jax.Array,   # [O/2, K/bsz] f32
    scale_hi: jax.Array,
):
    """Plane layout -> word layout for int4. Scales convert to bf16 — int4
    block scales are amax/7 (float) so this rounds them; serving parity
    tests bound the effect and the calibration path is unchanged.

    Returns (packed_word [O/2, K], scales [O, K/bsz] bf16)."""
    O2, K = packed.shape[-2:]
    bsz = K // scale_lo.shape[-1]
    tk = _word_tile_k(K, bsz)
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2)  # [O, K]
    scales = jnp.concatenate(
        [scale_lo, scale_hi], axis=-2
    ).astype(jnp.float32).astype(jnp.bfloat16)
    if _bitcast_order() == "interleaved":
        even, odd = codes[..., 0::2, :], codes[..., 1::2, :]
    else:
        to = _word_tile_o(2 * O2)
        lead = codes.shape[:-2]
        ct = codes.reshape(lead + (codes.shape[-2] // to, to, K))
        even = ct[..., : to // 2, :].reshape(lead + (O2, K))
        odd = ct[..., to // 2 :, :].reshape(lead + (O2, K))
    word = (even | (odd << 4)).astype(jnp.uint8)
    return permute_k(word, -1, tk, bsz=bsz), scales


def qmm_int4_word(
    x: jax.Array,
    packed_word: jax.Array,  # [O/2, K] uint8 row-pair bytes, K-permuted
    scales: jax.Array,       # [O, K/bsz] bf16, natural row order
) -> jax.Array:
    N, K = x.shape
    O = scales.shape[-2]
    nblk_total = scales.shape[-1]
    bsz = K // nblk_total
    tk = _word_tile_k(K, bsz)
    gk = K // tk
    nblk = tk // bsz
    to = _word_tile_o(O)
    go = O // to
    tn = _word_tile_n(N)
    gn = N // tn
    xp = permute_k(x, 1, tk, bsz=bsz)
    kern = functools.partial(_int4_word_kernel, bsz)
    return pl.pallas_call(
        kern,
        grid=(gn, go, gk),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda n, i, j: (n, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to // 2, tk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, nblk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=_interpret(),
    )(xp, packed_word, scales)


# --------------------------------------------------------------------------
# INT4, word2 layout: FOUR bytes (8 elements) per i32 lane
# --------------------------------------------------------------------------
#
# The word kernel widens each packed byte to its own i32 lane, so every
# SWAR op touches only 2 elements. word2 keeps 4 bytes resident per i32
# lane: one mask positions TWO bytes' nibbles in the two 16-bit halves, so
# each (mask, add) pair decodes 2 elements and the spread/widen cost is
# amortized over 8. Codes are pre-XORed with 8 at pack time, collapsing
# decode to `(nibbles & 0x000F000F) + 0x43004300` — bf16(128 + u) in both
# halves (the int4 magic-number construction, see qmm_int4_word above).
#
# The four nibble positions decode into four ROW GROUPS of the weight tile;
# each group gets its own dot into a column slice of the accumulator, so no
# in-kernel interleave is needed — the pack function places each logical
# row at the byte/nibble/sublane the decode maps to its group slot.
#
# Net: ~13 int ops + 4 bitcasts per 8 elements (vs ~6 ops + 1 bitcast per
# 2 in qmm_int4_word).


def _int4_word2_kernel(rep, x_ref, w_ref, s_ref, o_ref, acc):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]  # [TO/8, TK] int32: 4 bytes = 8 output rows
    to4 = s_ref.shape[0] // 4
    x = x_ref[:]
    # each group extracts its nibble pair straight from p (one shift + one
    # mask + one or each; nib | 0x4300 == nib + 0x4300 since the fields
    # don't overlap) — 11 int ops per 8 elements
    groups = (
        (p & 0x000F000F) | 0x43004300,
        ((p >> 4) & 0x000F000F) | 0x43004300,
        ((p >> 8) & 0x000F000F) | 0x43004300,
        ((p >> 12) & 0x000F000F) | 0x43004300,
    )
    for g, bits in enumerate(groups):
        w = pltpu.bitcast(bits, jnp.bfloat16)  # [TO/4, TK]
        s_full = pltpu.repeat(s_ref[g * to4 : (g + 1) * to4, :], rep, axis=1)
        w = (w - jnp.bfloat16(136.0)) * s_full
        acc[:, g * to4 : (g + 1) * to4] += jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def _word2_tile_o(O: int) -> int:
    """O-tile for word2 (pack and matmul must agree; 8 rows per i32 lane)."""
    to = min(WORD_TILE_O, O)
    while O % to or to % 8:
        to //= 2
        if to < 8:
            raise ValueError(f"word2 layout needs O divisible by 8, got {O}")
    return to


def int4_word2_pack(
    packed: jax.Array,     # [O/2, K] plane-packed uint8
    scale_lo: jax.Array,   # [O/2, K/bsz] f32
    scale_hi: jax.Array,
):
    """Plane layout -> word2 layout: 8 rows per i32 lane, K-lane tile
    permutation, row-ordered bf16 scales. Codes store XOR 8 (offset-binary)
    so the kernel's decode is mask+add only.

    Returns (packed_w2 [O/8, K] int32, scales [O, K/bsz] bf16)."""
    O2, K = packed.shape[-2:]
    O = 2 * O2
    bsz = K // scale_lo.shape[-1]
    tk = _word_tile_k(K, bsz)
    to = _word2_tile_o(O)
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2).astype(jnp.int32)
    codes = codes ^ 8
    scales = jnp.concatenate(
        [scale_lo, scale_hi], axis=-2
    ).astype(jnp.float32).astype(jnp.bfloat16)
    word = _word2_byte_pack(codes, to)
    return permute_k(word, -1, tk, bsz=bsz), scales


def qmm_int4_word2(
    x: jax.Array,
    packed_w2: jax.Array,   # [O/8, K] int32, K-permuted
    scales: jax.Array,      # [O, K/bsz] bf16, natural row order
) -> jax.Array:
    N, K = x.shape
    O = scales.shape[-2]
    nblk_total = scales.shape[-1]
    bsz = K // nblk_total
    tk = _word_tile_k(K, bsz)
    gk = K // tk
    nblk = tk // bsz
    to = _word2_tile_o(O)
    go = O // to
    tn = _word_tile_n(N)
    gn = N // tn
    xp = permute_k(x, 1, tk, bsz=bsz)
    kern = functools.partial(_int4_word2_kernel, bsz)
    return pl.pallas_call(
        kern,
        grid=(gn, go, gk),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda n, i, j: (n, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to // 8, tk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, nblk), lambda n, i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=_interpret(),
    )(xp, packed_w2, scales)


# --------------------------------------------------------------------------
# NVFP4, word2 layout: four bytes per i32 lane + remapped E2M1 decode
# --------------------------------------------------------------------------
#
# Same 4-bytes-per-lane group structure as qmm_int4_word2. The E2M1 decode
# exploits that bf16 bit patterns are affine in the magnitude index ABOVE
# the denormal boundary: bits(m') = (m' + 252) << 6 yields exactly
# {0.5, 0.75, 1, 1.5, 2, 3, 4, 6} for m' = 0..7. Packing REMAPS the code
# (swap m 0 <-> 1) so that value 0.5 sits at the affine slot m'=0 and the
# only non-affine value (zero) sits at m'=1, handled by one compare-free
# mask that zeroes the exponent/mantissa field (bits 6-14) and leaves the
# sign bit -> +-0.0, which multiplies to zero. This deletes the old
# kernel's denormal sub-path and xor-select (~4 ops/pair).


def _nvfp4_word2_kernel(rep, x_ref, w_ref, s_ref, gs_ref, o_ref, acc):
    j = pl.program_id(2)
    to4 = s_ref.shape[0] // 4

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]  # [TO/8, TK] i32: 4 bytes = 8 output rows
    x = x_ref[:]
    for g in range(4):
        n = (p >> (4 * g) if g else p) & 0x000F000F
        m = n & 0x00070007
        bits = (m + 0x00FC00FC) << 6               # affine E2M1 field
        zm = ((m ^ 0x00010001) + 0x00070007) & 0x00080008  # 8 iff m != 1
        bits = bits & (zm * 0x0FF8)                # zero slot -> field 0
        bits = bits | ((n & 0x00080008) << 12)     # sign -> bf16 bit 15
        w = pltpu.bitcast(bits, jnp.bfloat16)      # [TO/4, TK]
        s_full = pltpu.repeat(s_ref[g * to4 : (g + 1) * to4, :], rep, axis=1)
        acc[:, g * to4 : (g + 1) * to4] += jax.lax.dot_general(
            x, w * s_full, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc[:] * gs_ref[0, 0]).astype(o_ref.dtype)


def _word2_byte_pack(codes: jax.Array, to: int):
    """[..., O, K] 4-bit codes -> word2 i32 array [..., O/8, K] (bitcast-
    order-aware row placement shared by the int4/nvfp4/bd2 packs)."""
    lead = codes.shape[:-2]
    O, K = codes.shape[-2:]
    ct = codes.reshape(lead + (O // to, 4, to // 4, K))
    if _bitcast_order() == "interleaved":
        half0 = ct[..., 0::2, :]
        half1 = ct[..., 1::2, :]
    else:
        half0 = ct[..., : to // 8, :]
        half1 = ct[..., to // 8 :, :]

    def byte(h, ga, gb):
        return h[..., ga, :, :] | (h[..., gb, :, :] << 4)

    word = (
        byte(half0, 0, 1)
        | (byte(half0, 2, 3) << 8)
        | (byte(half1, 0, 1) << 16)
        | (byte(half1, 2, 3) << 24)
    )
    return word.reshape(lead + (O // 8, K)).astype(jnp.int32)


def nvfp4_word2_pack(
    packed: jax.Array,     # [O/2, K] plane-packed uint8 (E2M1 codes)
    scale_lo: jax.Array,   # [O/2, K/bsz]
    scale_hi: jax.Array,
    block_size: int = 16,
):
    """Plane layout -> nvfp4 word2: remapped codes (m 0<->1), 8 rows per
    i32 lane, K-lane tile permutation, row-ordered bf16 scales.

    Returns (packed_w2 [O/8, K] int32, scales [O, K/bsz] bf16)."""
    O2, K = packed.shape[-2:]
    O = 2 * O2
    tk = _word_tile_k(K, block_size)
    to = _word2_tile_o(O)
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2).astype(jnp.int32)
    m = codes & 7
    codes = (codes & 8) | (m ^ (m < 2).astype(jnp.int32))  # swap slots 0<->1
    scales = jnp.concatenate(
        [scale_lo, scale_hi], axis=-2
    ).astype(jnp.float32).astype(jnp.bfloat16)
    word = _word2_byte_pack(codes, to)
    return permute_k(word, -1, tk, bsz=block_size), scales


def qmm_nvfp4_word2(
    x: jax.Array,
    packed_w2: jax.Array,   # [O/8, K] int32, K-permuted, remapped codes
    scales: jax.Array,      # [O, K/bsz] bf16, natural row order
    global_scale: jax.Array,
    block_size: int = 16,
) -> jax.Array:
    N, K = x.shape
    O = scales.shape[-2]
    bsz = K // scales.shape[-1]
    tk = _word_tile_k(K, block_size)
    gk = K // tk
    nblk = tk // bsz
    to = _word2_tile_o(O)
    go = O // to
    tn = _word_tile_n(N)
    gn = N // tn
    xp = permute_k(x, 1, tk, bsz=block_size)
    gs2 = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    kern = functools.partial(_nvfp4_word2_kernel, bsz)
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
        out_shape=jax.ShapeDtypeStruct((N, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=_interpret(),
    )(xp, packed_w2, scales, gs2)


# --------------------------------------------------------------------------
# INT4, bd2 layout: word2 decode + post-dot block scales (batched MXU dots)
# --------------------------------------------------------------------------
#
# word2's profile shows the per-element bf16 tail (scale repeat + multiply
# + offset subtract over the [TO, TK] decoded tile) costs as much VPU as
# the nibble decode itself. bd2 removes it entirely for int4's 128-wide
# blocks by restructuring the dot per block:
#
#   y[n,o] = sum_b s[o,b] * (sum_{k in b} x[n,k] * u[o,k])  -  136 * sum_b
#            s[o,b] * xsum[n,b]
#
#  - the inner dots run BATCHED over blocks on the MXU (bsz = 128 = one
#    full lane dim per batch), consuming the DECODED-BUT-UNSCALED bf16
#    values 128+u straight from the word2 SWAR construction;
#  - scales apply to the [nblk, TN, TO] dot RESULTS — 16x fewer elements
#    than the weight tile — and the 128+u offset and the int4 -8 bias fold
#    into one tiny side-dot against per-block activation sums.
#
# HBM layout: packed i32 [K/bsz, O/8, bsz] (block-major), scales
# TRANSPOSED [K/bsz, O] bf16. No K-lane permutation (the block structure
# is explicit), so the per-call permute of x disappears too; x reshapes to
# [K/bsz, N, bsz] + per-block sums outside the kernel (cheap XLA ops on
# the activation).


def _int4_bd2_kernel(x_ref, w_ref, s_ref, xs_ref, o_ref, acc):
    j = pl.program_id(2)
    nblk = w_ref.shape[0]
    to4 = s_ref.shape[1] // 4

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]  # [nblk, TO/8, bsz] i32: 4 bytes = 8 output rows
    x3 = x_ref[:]  # [nblk, TN, bsz]
    s = s_ref[:]   # [nblk, TO] bf16
    groups = (
        (p & 0x000F000F) | 0x43004300,
        ((p >> 4) & 0x000F000F) | 0x43004300,
        ((p >> 8) & 0x000F000F) | 0x43004300,
        ((p >> 12) & 0x000F000F) | 0x43004300,
    )
    for g, bits in enumerate(groups):
        w = pltpu.bitcast(bits, jnp.bfloat16)  # [nblk, TO/4, bsz] = 128+u
        r = jax.lax.dot_general(
            x3, w, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [nblk, TN, TO/4]
        sg = s[:, g * to4 : (g + 1) * to4].astype(jnp.float32)
        acc[:, g * to4 : (g + 1) * to4] += jnp.sum(r * sg[:, None, :], axis=0)
    # fold out the +128 construction offset and the int4 -8 bias:
    # (128+u)*s summed needs -136 * sum_b s[o,b]*xsum[n,b]
    side = jax.lax.dot_general(
        xs_ref[:], s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, TO]
    acc[:] -= 136.0 * side

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def _int4_bd3_kernel(x_ref, w_ref, s_ref, xs_ref, o_ref, acc):
    """bd2 layout, fused-groups dot ("bd3"): concatenate the 4 decoded
    groups into one [nblk, TO, bsz] operand and run ONE deep batched dot
    per tile instead of 4 narrow ones — trades a VMEM concat copy for 4x
    fewer MXU dispatches ([TN, 128]x[128, TO] vs [TN, 128]x[128, TO/4]),
    attacking the small-dot pipeline-latency hypothesis for bd2's 196 GB/s
    engine stream (r04 A/B: bd2 18.93 ms/step vs bf16's 490 GB/s)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]   # [nblk, TO/8, bsz] i32: 4 bytes = 8 output rows
    x3 = x_ref[:]  # [nblk, TN, bsz]
    s = s_ref[:]   # [nblk, TO] bf16
    w = jnp.concatenate([
        pltpu.bitcast(((p >> (4 * g) if g else p) & 0x000F000F)
                      | 0x43004300, jnp.bfloat16)
        for g in range(4)
    ], axis=1)  # [nblk, TO, bsz] decoded-but-unscaled 128+u
    r = jax.lax.dot_general(
        x3, w, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [nblk, TN, TO]
    acc[:] += jnp.sum(r * s.astype(jnp.float32)[:, None, :], axis=0)
    side = jax.lax.dot_general(
        xs_ref[:], s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, TO]
    acc[:] -= 136.0 * side

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def _bd2_tile_k(K: int, bsz: int) -> int:
    """K-tile (in elements) for bd2; nblk per tile is a free leading dim.
    QMM_BD2_TK env-overrides for on-chip tile sweeps (must divide K or the
    whole-K fallback is used). Default 4096 since the r04 sweep (with
    TO=512 + fused groups: 1.505x -> 1.713x; llama K dims are 4096/14336,
    so this is whole-K for gate/up and 14336-fallback for down)."""
    tk = int(os.environ.get("QMM_BD2_TK", "4096"))
    return tk if K % tk == 0 else K


def int4_bd2_pack(
    packed: jax.Array,     # [O/2, K] plane-packed uint8
    scale_lo: jax.Array,   # [O/2, K/bsz] f32
    scale_hi: jax.Array,
):
    """Plane layout -> bd2 layout. Codes store XOR 8 (offset-binary).

    Returns (packed_bd2 [K/bsz, O/8, bsz] int32, scalesT [K/bsz, O] bf16).
    """
    O2, K = packed.shape[-2:]
    O = 2 * O2
    bsz = K // scale_lo.shape[-1]
    to = _word2_tile_o(O)
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2).astype(jnp.int32)
    codes = codes ^ 8
    scalesT = jnp.swapaxes(
        jnp.concatenate([scale_lo, scale_hi], axis=-2)
        .astype(jnp.float32).astype(jnp.bfloat16),
        -1, -2,
    )  # [K/bsz, O]
    lead = packed.shape[:-2]
    word = _word2_byte_pack(codes, to).reshape(lead + (O // 8, K // bsz, bsz))
    nd = word.ndim
    perm = tuple(range(nd - 3)) + (nd - 2, nd - 3, nd - 1)
    return word.transpose(perm), scalesT  # [..., K/bsz, O/8, bsz]


def bd2_supported(O: int, bsz: int) -> bool:
    """bd2 needs a Mosaic-legal scale tile ([nblk, TO] lane dim multiple of
    128 or full) and 128-wide blocks for full-lane batched dots."""
    if bsz % 128:
        return False
    try:
        to = _word2_tile_o(O)
    except ValueError:
        return False
    return to % 128 == 0 or to == O


def qmm_int4_bd2(
    x: jax.Array,
    packed_bd2: jax.Array,  # [K/bsz, O/8, bsz] int32
    scalesT: jax.Array,     # [K/bsz, O] bf16
    fuse_groups: bool | None = None,
) -> jax.Array:
    if fuse_groups is None:  # default ON since the r04 sweep: bd3 (one
        # deep batched dot per tile) + TO512/TK4096 = 1.713x chip-
        # normalized bf16 vs plain bd2's 1.505x (engine_int4_bd3_*.json)
        fuse_groups = os.environ.get("QMM_BD2_FUSE", "1") == "1"
    N, K = x.shape
    O = scalesT.shape[-1]
    nblk_total = scalesT.shape[-2]
    bsz = K // nblk_total
    tk = _bd2_tile_k(K, bsz)
    gk = K // tk
    nblk = tk // bsz
    to = _word2_tile_o(O)
    go = O // to
    tn = _word_tile_n(N)
    gn = N // tn
    if fuse_groups and tn > 64:
        # bd3's fused dot result [nblk, tn, TO] f32 is 16 MB at prefill
        # row tiles (nblk 32, tn 256, TO 512) — over the scoped-vmem
        # budget (the r02 33.4 MB OOM class). Unfused bd2 keeps the
        # per-group result 4x smaller; decode (tn <= 64) stays fused.
        fuse_groups = False
    x3 = jnp.swapaxes(x.reshape(N, nblk_total, bsz), 0, 1)  # [K/bsz, N, bsz]
    xs = jnp.sum(x3.astype(jnp.float32), axis=-1)           # [K/bsz, N]
    return pl.pallas_call(
        _int4_bd3_kernel if fuse_groups else _int4_bd2_kernel,
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
        out_shape=jax.ShapeDtypeStruct((N, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=_interpret(),
    )(x3, packed_bd2, scalesT, xs)


# --------------------------------------------------------------------------
# W4A8: int4 weights + per-token int8 activations on the int8 MXU
# --------------------------------------------------------------------------
#
# The reference's W4A8 rows are its fastest 4-bit serving format at batch
# (`benchmark.md:23-25`: W4A8-AWQ 1.00x/1.15x bf16 at BS8/64 where INT4-AWQ
# is 0.75x/0.83x) because the W4 decode targets the 8-bit tensor-core path
# instead of half floats. The TPU-native analog: decode nibbles to int8
# CODES u in [0,15] (2 VPU ops per i32 word of 8 elements = ~0.4
# ops/element, vs ~1.4 for the bf16 magic-number construct) and run the
# dots on the MXU's native s8 x s8 -> s32 path (probed live 2026-08-20:
# Mosaic lowers batched int8 dot_generals; int8 vector ALU ops are
# rejected, so the -8 offset folds into a side-dot exactly like bd2's 136).
# Activations quantize per token to int8 (the reference uses per-tensor
# fp8 acts; v5e has no fp8 MXU — per-token int8 is the native 8-bit act
# path and is numerically at least as faithful).
#
#   y[n,o] = s_x[n] * ( sum_b s_w[o,b] * (x8[n,:] . u[o,:])_b
#                       - 8 * sum_b s_w[o,b] * xsum8[n,b] )
#
# Layout mirrors bd2 (block-major): packed i32 [K/bsz, O/8, bsz], scales
# TRANSPOSED [K/bsz, O] bf16 — same sharding/spec structure, so TP reuses
# the bd2 branches. Row placement follows the i32->int8 bitcast order
# (byte b of word r -> sublane 4r+b "interleaved", probed).


@functools.cache
def _bitcast_order_i8() -> str:
    """How pltpu.bitcast(i32 -> int8) orders the quadrupled sublanes:
    "interleaved" (word r -> rows 4r..4r+3, byte 0 first) or "split"
    (byte b of word r -> row b*R + r). Probed once on the live backend."""
    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)

    x = jnp.full((8, 128), 0x04030201, jnp.int32)
    probe = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int8),
        interpret=_interpret(),
    )(x)
    r = [int(probe[i, 0]) for i in (0, 1, 2, 3, 8, 16, 24)]
    if r[:4] == [1, 2, 3, 4]:
        return "interleaved"
    if (r[0], r[4], r[5], r[6]) == (1, 2, 3, 4):
        return "split"
    raise RuntimeError(f"unrecognized i32->int8 bitcast order: {r}")


def _w48_byte_pack(codes: jax.Array, to: int) -> jax.Array:
    """[..., O, K] 4-bit codes -> [..., O/8, K] i32 for the int8-bitcast
    decode: the kernel emits [bitcast(evens) ++ bitcast(odds)] per O-tile,
    so rows [0, to/2) come from even nibbles, [to/2, to) from odd, with
    byte placement per `_bitcast_order_i8()`."""
    lead = codes.shape[:-2]
    O, K = codes.shape[-2:]
    ct = codes.reshape(lead + (O // to, to, K))
    lo = ct[..., : to // 2, :]
    hi = ct[..., to // 2 :, :]
    R = to // 8  # i32 word-rows per tile

    def by_byte(h):
        # -> [..., O/to, R, 4, K]: [r, b] = source row for (word r, byte b)
        if _bitcast_order_i8() == "interleaved":
            return h.reshape(lead + (O // to, R, 4, K))
        return jnp.swapaxes(h.reshape(lead + (O // to, 4, R, K)), -3, -2)

    lo4, hi4 = by_byte(lo), by_byte(hi)
    word = jnp.zeros(lead + (O // to, R, K), jnp.int32)
    for b in range(4):
        byte = lo4[..., b, :] | (hi4[..., b, :] << 4)
        word = word | (byte << (8 * b))
    return word.reshape(lead + (O // 8, K)).astype(jnp.int32)


def int4_w48_pack(
    packed: jax.Array,     # [O/2, K] plane-packed uint8
    scale_lo: jax.Array,   # [O/2, K/bsz] f32
    scale_hi: jax.Array,
):
    """Plane layout -> w48 layout. Codes store XOR 8 (offset-binary u =
    v + 8 in [0, 15]); the -8 rides the side-dot.

    Returns (packed_w48 [K/bsz, O/8, bsz] int32, scalesT [K/bsz, O] bf16).
    """
    O2, K = packed.shape[-2:]
    O = 2 * O2
    bsz = K // scale_lo.shape[-1]
    to = _word2_tile_o(O)
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2).astype(jnp.int32)
    codes = codes ^ 8
    scalesT = jnp.swapaxes(
        jnp.concatenate([scale_lo, scale_hi], axis=-2)
        .astype(jnp.float32).astype(jnp.bfloat16),
        -1, -2,
    )  # [K/bsz, O]
    lead = packed.shape[:-2]
    word = _w48_byte_pack(codes, to).reshape(lead + (O // 8, K // bsz, bsz))
    nd = word.ndim
    perm = tuple(range(nd - 3)) + (nd - 2, nd - 3, nd - 1)
    return word.transpose(perm), scalesT  # [..., K/bsz, O/8, bsz]


w48_supported = bd2_supported  # same tiling constraints (128-wide blocks)


def _int4_w48_kernel(x_ref, w_ref, s_ref, xs_ref, o_ref, acc):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]   # [nblk, TO/8, bsz] i32: 4 bytes x 2 nibbles = 8 rows
    x3 = x_ref[:]  # [nblk, TN, bsz] int8
    s = s_ref[:]   # [nblk, TO] bf16
    # nibble -> int8 codes: 3 i32 ops per 8 elements, then free bitcasts.
    # (p >> 4) sign-extends the top byte; the 0x0F mask byte-wise discards
    # the extension bits.
    evens = p & 0x0F0F0F0F
    odds = (p >> 4) & 0x0F0F0F0F
    u = jnp.concatenate(
        [pltpu.bitcast(evens, jnp.int8), pltpu.bitcast(odds, jnp.int8)],
        axis=1,
    )  # [nblk, TO, bsz] codes u = v + 8 in [0, 15]
    r = jax.lax.dot_general(
        x3, u, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [nblk, TN, TO] s8 x s8 -> s32 on the MXU
    acc[:] += jnp.sum(
        r.astype(jnp.float32) * s.astype(jnp.float32)[:, None, :], axis=0)
    side = jax.lax.dot_general(
        xs_ref[:], s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, TO] = sum_b xsum8[n,b] * s[b,o]
    acc[:] -= 8.0 * side

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:]


def _int4_w48_kernel_noside(x_ref, w_ref, s_ref, o_ref, acc):
    """Row-tiled (prefill) variant: the -8 offset side-dot moves OUTSIDE
    the kernel. Rationale: the in-kernel side term needs an xs block whose
    LAST dim is the row tile tn; at decode tn == N (full dim, always
    legal), but prefill row-tiling (tn = 64 < N) makes the spec
    Mosaic-illegal ("divisible by 8 and 128" — the r04 a8 TTFT crash,
    BENCH_r04.json tail). One [N, K/bsz] x [K/bsz, O] XLA matmul outside
    covers all row tiles instead."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]
    x3 = x_ref[:]
    s = s_ref[:]
    evens = p & 0x0F0F0F0F
    odds = (p >> 4) & 0x0F0F0F0F
    u = jnp.concatenate(
        [pltpu.bitcast(evens, jnp.int8), pltpu.bitcast(odds, jnp.int8)],
        axis=1,
    )
    r = jax.lax.dot_general(
        x3, u, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    acc[:] += jnp.sum(
        r.astype(jnp.float32) * s.astype(jnp.float32)[:, None, :], axis=0)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:]


def qmm_int4_w48(
    x8: jax.Array,          # [N, K] int8 per-token-quantized activations
    packed_w48: jax.Array,  # [K/bsz, O/8, bsz] int32
    scalesT: jax.Array,     # [K/bsz, O] bf16
) -> jax.Array:
    """Returns f32 [N, O] = dequant-dot BEFORE the per-token activation
    scale — the caller multiplies by a_scale[n] (and adds bias etc.)."""
    N, K = x8.shape
    O = scalesT.shape[-1]
    nblk_total = scalesT.shape[-2]
    bsz = K // nblk_total
    tk = _bd2_tile_k(K, bsz)
    gk = K // tk
    nblk = tk // bsz
    to = _word2_tile_o(O)
    go = O // to
    tn = _word_tile_n(N)
    while tn > 64 and tn % 2 == 0 and (tn // 2) % 8 == 0:
        # the fused dot result [nblk, tn, TO] i32 is 16 MB at tn=256 with
        # TO=512/nblk=32 — cap prefill row tiles at 64 (same VMEM class as
        # bd3's prefill guard; decode N<=64 is unaffected)
        tn //= 2
    gn = N // tn
    x3 = jnp.swapaxes(x8.reshape(N, nblk_total, bsz), 0, 1)  # [K/bsz, N, bsz]
    xs = jnp.sum(x3.astype(jnp.float32), axis=-1)            # [K/bsz, N]
    in_specs = [
        pl.BlockSpec((nblk, tn, bsz), lambda n, i, j: (j, n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk, to // 8, bsz), lambda n, i, j: (j, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk, to), lambda n, i, j: (j, i),
                     memory_space=pltpu.VMEM),
    ]
    if gn == 1:
        # decode: xs block's last dim is the FULL N — legal, and the side
        # term fuses into the same kernel
        y = pl.pallas_call(
            _int4_w48_kernel,
            grid=(gn, go, gk),
            in_specs=in_specs + [
                pl.BlockSpec((nblk, tn), lambda n, i, j: (j, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
            interpret=_interpret(),
        )(x3, packed_w48, scalesT, xs)
        return y
    # prefill row-tiled path (see _int4_w48_kernel_noside docstring)
    y = pl.pallas_call(
        _int4_w48_kernel_noside,
        grid=(gn, go, gk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=_interpret(),
    )(x3, packed_w48, scalesT)
    side = jax.lax.dot_general(
        xs, scalesT.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, O] = sum_b xsum8[n,b] * s[b,o]
    return y - 8.0 * side


# --------------------------------------------------------------------------
# NVFP4 bd4: block-major layout with O on lanes, one deep dot per K-tile
# --------------------------------------------------------------------------
#
# word2's profile charges nvfp4 twice beyond the nibble decode: the scale
# `pltpu.repeat` along LANES (an expensive vector shuffle, one written
# element per weight) and the K-lane tile permutation of x. bd4 restructures
# the tile so both disappear while the dot stays DEEP (the shallow
# 16-contraction batched dot that a literal bd2 port would produce is
# MXU-dispatch-bound at nvfp4's bsz=16):
#
#  - HBM words [K/64, 8, O] i32: O rides the LANE dim (natural order, no
#    row pairing), sublanes are 8 i32 words = 64 weights = one K
#    "super-block" of four 16-wide scale blocks. Nibble-group g of each
#    word belongs to scale block g, so each group's decode output
#    [K64, 16, O] is exactly one scale block;
#  - the per-block E4M3-derived scale multiplies the decoded group with a
#    SUBLANE broadcast (free in Mosaic vregs, vs word2's lane repeat), which
#    makes the 4 groups concat into [K64, 64, O] -> one [TK, O] operand
#    consumed by a single deep [TN, TK] x [TK, O] MXU dot per tile —
#    no batched-dot scale tail, no x permutation, no r materialization.
#
# Decode construct, code remap, and zero handling are word2's (exact E2M1
# by construction, `tests/test_numerics.py` contract; reference numeric
# contract: `modelopt/torch/quantization/qtensor/nvfp4_tensor.py:18-49`).


def bd4_supported(O: int, K: int, bsz: int) -> bool:
    """bd4 needs blocks that tile the 64-weight super-block (16 for nvfp4,
    32/64 for mxfp4 — scales duplicate per 16-group at pack time), K a
    multiple of 64, and a Mosaic-legal lane tile."""
    if bsz not in (16, 32, 64) or K % 64:
        return False
    try:
        to = _word2_tile_o(O)
    except ValueError:
        return False
    return to % 128 == 0 or to == O


def _bd4_tile_k(K: int) -> int:
    """K-tile for bd4 (multiple of 64). Default 4096 (same class as bd2's
    measured-best TK); for K it doesn't divide, the largest <=4096 divisor
    that is a multiple of 64 (14336 -> 3584) keeps the decoded [K64, 64,
    TO] bf16 tile inside the scoped-vmem budget."""
    tk = int(os.environ.get("QMM_BD4_TK", "4096"))
    # only honor the override when it is a Mosaic-legal bd4 tile (multiple
    # of 64 that divides K) — otherwise fall through to the divisor search
    # instead of producing tk//64 == 0 BlockSpec shapes
    if tk % 64 == 0 and tk > 0 and K % tk == 0:
        return tk
    for t in range(min(4096, K), 63, -64):
        if K % t == 0:
            return t
    return K


def nvfp4_bd4_pack(
    packed: jax.Array,     # [O/2, K] plane-packed uint8 (E2M1 codes)
    scale_lo: jax.Array,   # [O/2, K/bsz]
    scale_hi: jax.Array,
    block_size: int = 16,
):
    """Plane layout -> bd4. Word at (B, r, o) holds, in nibble-group g of
    half h (h=0 = bits 0-15), the code of k = B*64 + g*16 + j with
    j = 2r+h ("interleaved" i32->bf16 bitcast order) or h*8+r ("split").
    Codes get word2's m-slot 0<->1 remap so the kernel's affine construct
    decodes E2M1 exactly.

    Returns (packed_bd4 [..., K/64, 8, O] int32,
             scalesT    [..., 4, K/64, O] bf16)."""
    O2, K = packed.shape[-2:]
    O = 2 * O2
    lead = packed.shape[:-2]
    codes = jnp.concatenate([packed & 0xF, packed >> 4], axis=-2).astype(jnp.int32)
    m = codes & 7
    codes = (codes & 8) | (m ^ (m < 2).astype(jnp.int32))
    B = K // 64
    c = codes.reshape(lead + (O, B, 4, 16))
    if _bitcast_order() == "interleaved":
        c = c.reshape(lead + (O, B, 4, 8, 2))
        lo, hi = c[..., 0], c[..., 1]            # [.., O, B, 4, 8]
    else:
        c = c.reshape(lead + (O, B, 4, 2, 8))
        lo, hi = c[..., 0, :], c[..., 1, :]
    half_lo = jnp.zeros(lead + (O, B, 8), jnp.int32)
    half_hi = jnp.zeros(lead + (O, B, 8), jnp.int32)
    for g in range(4):
        half_lo = half_lo | (lo[..., g, :] << (4 * g))
        half_hi = half_hi | (hi[..., g, :] << (4 * g))
    word = jnp.moveaxis(half_lo | (half_hi << 16), -3, -1)  # [.., B, 8, O]
    scales = jnp.concatenate(
        [scale_lo, scale_hi], axis=-2
    ).astype(jnp.float32).astype(jnp.bfloat16)              # [.., O, K/bsz]
    # kernel row g covers k = g*16..g*16+15 -> scale block (g*16)//bsz;
    # wider blocks (mxfp4's 32/64) duplicate per 16-group
    sT = scales.reshape(lead + (O, B, 64 // block_size))
    if block_size != 16:
        sT = jnp.repeat(sT, block_size // 16, axis=-1)
    sT = jnp.moveaxis(sT, (-3, -1), (-1, -3))               # [.., 4, B, O]
    return word, sT


def _nvfp4_bd4_kernel(flat, x_ref, w_ref, s_ref, gs_ref, o_ref, acc):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]   # [K64, 8, TO] i32: 2 halves x 4 nibble-groups
    parts = []
    for g in range(4):
        n = (p >> (4 * g) if g else p) & 0x000F000F
        m = n & 0x00070007
        bits = (m + 0x00FC00FC) << 6               # affine E2M1 field
        zm = ((m ^ 0x00010001) + 0x00070007) & 0x00080008  # 8 iff m != 1
        bits = bits & (zm * 0x0FF8)                # zero slot -> field 0
        bits = bits | ((n & 0x00080008) << 12)     # sign -> bf16 bit 15
        w = pltpu.bitcast(bits, jnp.bfloat16)      # [K64, 16, TO]
        # block scale: sublane broadcast (vs word2's lane repeat); the
        # E2M1 x E4M3 product is exact in bf16 (both mantissas on the
        # 1/128 grid, no subnormals)
        parts.append(w * s_ref[g][:, None, :])
    wcat = jnp.concatenate(parts, axis=1)          # [K64, 64, TO]
    x3 = x_ref[:]                                  # [K64, TN, 64]
    if flat:
        # one deep [TN, TK] x [TK, TO] dot: merges the batch dim into
        # sublanes (reshape may relayout — A/B'd on-chip vs batched)
        wfull = wcat.reshape(wcat.shape[0] * 64, wcat.shape[2])
        xfull = jnp.swapaxes(x3, 0, 1).reshape(-1, wfull.shape[0])
        acc[:] += jax.lax.dot_general(
            xfull, wfull, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        r = jax.lax.dot_general(
            x3, wcat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [K64, TN, TO] batched 64-deep dots
        acc[:] += jnp.sum(r, axis=0)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc[:] * gs_ref[0, 0]).astype(o_ref.dtype)


def qmm_nvfp4_bd4(
    x: jax.Array,
    packed_bd4: jax.Array,  # [K/64, 8, O] int32
    scalesT: jax.Array,     # [4, K/64, O] bf16
    global_scale: jax.Array,
) -> jax.Array:
    N, K = x.shape
    O = scalesT.shape[-1]
    tk = _bd4_tile_k(K)
    gk = K // tk
    to = _word2_tile_o(O)
    go = O // to
    tn = _word_tile_n(N)
    gn = N // tn
    gs2 = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    flat = os.environ.get("QMM_BD4_FLAT", "0") == "1"
    x3 = jnp.swapaxes(x.reshape(N, K // 64, 64), 0, 1)  # [K/64, N, 64]
    return pl.pallas_call(
        functools.partial(_nvfp4_bd4_kernel, flat),
        grid=(gn, go, gk),
        in_specs=[
            pl.BlockSpec((tk // 64, tn, 64), lambda n, i, j: (j, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 64, 8, to), lambda n, i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tk // 64, to), lambda n, i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda n, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda n, i, j: (n, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, to), jnp.float32)],
        interpret=_interpret(),
    )(x3, packed_bd4, scalesT, gs2)


# --------------------------------------------------------------------------
# Dispatch
# --------------------------------------------------------------------------


@functools.cache
def _s4_nibble_order() -> str:
    """Which nibble `lax.bitcast_convert_type(uint8 -> int4)` emits first.

    Returns "low_first" (element 0 = bits 0-3) or "high_first". Probed once
    on the live backend: the HLO bitcast-convert's sub-byte element order
    is a backend layout detail. The s4 values are converted to int8 INSIDE
    the probe jit — s4 host transfers crash on axon."""
    probe = jax.jit(lambda: jax.lax.bitcast_convert_type(
        jnp.full((8, 128), 0x21, jnp.uint8), jnp.int4).astype(jnp.int8))()
    a, b = int(probe[0, 0, 0]), int(probe[0, 0, 1])
    if (a, b) == (1, 2):
        return "low_first"
    if (a, b) == (2, 1):
        return "high_first"
    raise RuntimeError(f"unrecognized u8->s4 bitcast order: {a}, {b}")


def int4_xla_pack(q: jax.Array) -> jax.Array:
    """[..., O, K] signed int4 codes (any int dtype) -> uint8 [..., O, K/2]
    packed so `bitcast_convert_type(-, int4).reshape(..., O, K)` restores
    element order (k-adjacent pairs per byte, nibble order per backend
    probe). Calls `_s4_nibble_order()` — run it eagerly before tracing."""
    n = (q.astype(jnp.int32) & 0xF).astype(jnp.uint8)
    a, b = n[..., 0::2], n[..., 1::2]
    lo, hi = (a, b) if _s4_nibble_order() == "low_first" else (b, a)
    return (lo | (hi << 4)).astype(jnp.uint8)


def qmm_int4_xla(x: jax.Array, arrays: dict) -> jax.Array:
    """XLA-native int4 GEMM: packed bytes bitcast to jnp.int4 (HLO s4) at
    the top of the jit, then a grouped convert-dot.

    The escalation route VERDICT r3 weak #1 asked for: instead of hand
    nibble-decode in Pallas (VPU-bound at ~15 GB/s packed), let XLA:TPU own
    the sub-byte decode — the s4->bf16 convert fuses into the dot operand
    read, the exact route that made int8/fp8 fast (`quantized_matmul`
    docstring). Storage is uint8 [O, K/2] in `_s4_nibble_order()` layout
    (NOT plane layout): s4 arrays crash both host transfers AND jit
    argument passing on axon (device_put recursion, observed 2026-08-20),
    so the s4 view exists only inside the jit — one free bitcast from the
    streamed bytes. NOTE distinct from the earlier "s4-via-bitcast-in-
    Pallas" attempt (829 us): that decoded nibbles on the VPU; here XLA
    owns the convert.

    Per-K-block scales [O, G] can't fold into a flat dot, so decode:
      t[g, b, o] = x[b, g*bsz:(g+1)*bsz] . w[o, g*bsz:(g+1)*bsz]
      y[b, o]    = sum_g t[g, b, o] * scale[o, g]
    a G-batched MXU matmul plus a small weighted reduce; t is [G, B, O]
    fp32 (tiny at decode batch sizes). Prefill (B > 64) dequantizes once
    and runs a single dot — t would be B-proportional there.
    """
    qp, sc = arrays["qpacked"], arrays["scale"]
    O, K = qp.shape[-2], qp.shape[-1] * 2
    q4 = jax.lax.bitcast_convert_type(qp, jnp.int4).reshape(O, K)
    G = sc.shape[-1]
    bsz = K // G
    B = x.shape[0]
    if B > 64:  # prefill regime: one bf16 weight materialization + MXU dot
        w = (q4.astype(jnp.float32).reshape(O, G, bsz)
             * sc.astype(jnp.float32)[..., None]).reshape(O, K)
        return x @ w.astype(x.dtype).T
    t = jnp.einsum(
        "bgk,ogk->gbo", x.reshape(B, G, bsz),
        q4.astype(x.dtype).reshape(O, G, bsz),
        preferred_element_type=jnp.float32,
    )
    y = jnp.einsum("gbo,og->bo", t, sc.astype(jnp.float32))
    return y.astype(x.dtype)


def quantized_matmul(x: jax.Array, kind: str, arrays: dict) -> jax.Array:
    """y = x @ dequant(W)^T for a packed weight dict (see quant/compress.py).

    Per-format backend choice is empirical (slope-timed same-process A/B at
    llama-8B gate shape, tools/probe_qmm_scan.py 2026-08-18): the BYTE
    formats (int8/fp8) go through XLA's native convert-fused dot with the
    scale applied to the [N, O] OUTPUT — XLA folds the i8/e4m3->bf16 convert
    into the MXU operand read at full HBM bandwidth (79/86 us vs 165/973 us
    for the hand-written Pallas kernels, whose Mosaic byte->bf16 converts
    are VPU-bound). Scaling the WEIGHT before the dot instead forces XLA to
    materialize the bf16 weight and loses the fusion. The sub-byte formats
    (int4/nvfp4/mxfp4) keep Pallas word kernels: XLA cannot consume packed
    nibble layouts (s4-via-bitcast measured 829 us).
    """
    if kind in ("int8", "fp8"):
        y = jax.lax.dot_general(
            x, arrays["q"].astype(x.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # per-channel [O, 1] or per-tensor scalar scale, output-side
        return (y * arrays["scale"].reshape(1, -1)).astype(x.dtype)
    if kind == "int4":
        return qmm_int4(x, arrays["packed"], arrays["scale_lo"], arrays["scale_hi"])
    if kind == "int4x":  # XLA-native s4 storage (backend-independent)
        return qmm_int4_xla(x, arrays)
    if kind == "nvfp4":
        sl = arrays["scale_lo"].astype(jnp.float32)
        sh = arrays["scale_hi"].astype(jnp.float32)
        return qmm_nvfp4(x, arrays["packed"], sl, sh, arrays["global_scale"])
    if kind == "nvfp4p":  # K-permuted layout (convert_nvfp4_perm)
        return qmm_nvfp4_perm(x, arrays["packed"], arrays["scale_lo"],
                              arrays["scale_hi"], arrays["global_scale"])
    if kind == "nvfp4w":  # row-pair word-decode layout (convert_nvfp4_word)
        return qmm_nvfp4_word(x, arrays["packed"], arrays["scales"],
                              arrays["global_scale"])
    if kind == "int4w":  # row-pair word-decode layout (convert_int4_word)
        return qmm_int4_word(x, arrays["packed"], arrays["scales"])
    if kind == "int4w2":  # 4-bytes-per-lane word2 layout (convert_int4_word2)
        return qmm_int4_word2(x, arrays["packed"], arrays["scales"])
    if kind == "int4b2":  # block-major batched-dot layout (convert_int4_bd2)
        return qmm_int4_bd2(x, arrays["packed"], arrays["scales"])
    if kind == "nvfp4w2":  # 4-bytes-per-lane remapped-decode layout
        return qmm_nvfp4_word2(x, arrays["packed"], arrays["scales"],
                               arrays["global_scale"])
    if kind == "nvfp4b4":  # block-major O-on-lanes deep-dot layout
        return qmm_nvfp4_bd4(x, arrays["packed"], arrays["scales"],
                             arrays["global_scale"])
    if kind == "mxfp4b4":  # same kernel; scales pre-duplicated per
        # 16-group at pack time, exact bf16 powers of two, no global scale
        return qmm_nvfp4_bd4(x, arrays["packed"], arrays["scales"],
                             jnp.float32(1.0))
    if kind == "mxfp4w2":  # MXFP4 on the word2 kernel: 32-wide blocks,
        # exact power-of-two bf16 scales, no global scale
        bs = x.shape[-1] // arrays["scales"].shape[-1]
        return qmm_nvfp4_word2(x, arrays["packed"], arrays["scales"],
                               jnp.float32(1.0), block_size=bs)
    if kind == "mxfp4w":  # MXFP4 word layout: same kernel, 32-wide blocks,
        # scales pre-converted to exact bf16 powers of two, no global scale
        bs = x.shape[-1] // arrays["scales"].shape[-1]
        return qmm_nvfp4_word(x, arrays["packed"], arrays["scales"],
                              jnp.float32(1.0), block_size=bs)
    if kind == "bf16":
        return x @ arrays["w"].T.astype(x.dtype)
    raise ValueError(f"unknown kind {kind!r}")
