"""Pure-jnp quantization numerics (the reference "kernel layer", TPU-first).

These are the ground-truth implementations of every quant format's rounding
math. They are written as traceable, compiler-friendly jnp code (no Python
control flow on values) so XLA fuses them into surrounding compute; the Pallas
kernels in `ops/pallas/` implement the same contracts for the hot paths and are
golden-tested against these.

Numeric contracts replicated from the reference (cited for parity checks):
 - INT fake quant: scale = amax / (2^(b-1)-1), round-to-nearest-even, clamp
   (`modelopt/torch/quantization/tensor_quant.py:319` FakeTensorQuantFunction).
 - FP8 E4M3 scaled cast: x * (448/amax) -> saturating E4M3 -> rescale
   (`tensor_quant.py:402` ScaledE4M3Function).
 - NVFP4: E2M1 values + E4M3 per-block scales + fp32 global scale
   amax/(6*448); rounding boundaries from
   `kernels/quantization/common/nvfp4_quant.py:18-49` (round-half-to-even at
   odd-mantissa boundaries) and two-level scale math from
   `qtensor/nvfp4_tensor.py:168-230`.
 - MX formats: 32-element blocks, shared E8M0 scale 2^(floor(log2(amax))-emax)
   (`kernels/quantization/gemm/tensor_quant_mx.cu`).
 - NF4: 16-level normal-float table with double-quantized absmax scales
   (`qtensor/nf4_tensor.py`).

We deliberately avoid jnp.float4_e2m1fn arrays (broken on the axon TPU
transfer path); E2M1/E3M2/E2M3 rounding is done arithmetically, which also
works inside Pallas kernels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .formats import (
    fp_emax,
    fp_max_representable,
    int_max_bound,
    int_min_bound,
)

# --------------------------------------------------------------------------
# Generic float rounding (arithmetic, dtype-free)
# --------------------------------------------------------------------------


def fp_round(x: jax.Array, ebits: int, mbits: int, saturate: bool = True) -> jax.Array:
    """Round `x` (fp32) to the nearest (E, M) mini-float value, RTNE.

    Handles normals and subnormals. With `saturate`, magnitudes beyond the
    max representable clamp to it (matching the reference's saturating casts).
    """
    x = x.astype(jnp.float32)
    maxval = fp_max_representable(ebits, mbits)
    bias = 2 ** (ebits - 1) - 1
    absx = jnp.abs(x)
    # Exact exponent via frexp (mantissa in [0.5, 1)): e = frexp_exp - 1.
    # log2+floor is inexact just below powers of two; frexp is bit-exact.
    _, fe = jnp.frexp(jnp.maximum(absx, jnp.finfo(jnp.float32).tiny))
    e = fe.astype(jnp.int32) - 1
    # Floor at the subnormal threshold so subnormals round on the fixed
    # 2^(1-bias-mbits) grid.
    e = jnp.maximum(e, 1 - bias)
    # Quantum = ulp at this exponent. ldexp with an integer exponent is
    # bit-exact (XLA's exp2 is not); jnp.round is round-half-to-even.
    quantum = jnp.ldexp(jnp.float32(1.0), e - mbits)
    q = jnp.round(x / quantum) * quantum
    if saturate:
        q = jnp.clip(q, -maxval, maxval)
    return jnp.where(absx == 0.0, jnp.zeros_like(q), q)


# E2M1 representable magnitudes (for packing / codebooks)
E2M1_VALUES = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)


def fp4_round(x: jax.Array) -> jax.Array:
    """E2M1 rounding with the reference's exact decision boundaries.

    `nvfp4_quant.py:18-49`: <=0.25 -> 0, <0.75 -> 0.5, <=1.25 -> 1,
    <1.75 -> 1.5, <=2.5 -> 2, <3.5 -> 3, <=5 -> 4, else 6 — i.e.
    round-half-to-even at odd-mantissa boundaries. Written as a comparison
    chain (cheap VPU code, Pallas-safe).
    """
    x = x.astype(jnp.float32)
    m = jnp.abs(x)
    mag = jnp.where(
        m <= 0.25, 0.0,
        jnp.where(m < 0.75, 0.5,
        jnp.where(m <= 1.25, 1.0,
        jnp.where(m < 1.75, 1.5,
        jnp.where(m <= 2.5, 2.0,
        jnp.where(m < 3.5, 3.0,
        jnp.where(m <= 5.0, 4.0, 6.0)))))))  # fmt: skip
    return jnp.sign(x) * mag


def cast_e4m3(x: jax.Array) -> jax.Array:
    """Saturating round-trip through E4M3 (native dtype; clamp avoids NaN)."""
    x32 = jnp.clip(x.astype(jnp.float32), -448.0, 448.0)
    return x32.astype(jnp.float8_e4m3fn).astype(jnp.float32)


def cast_e5m2(x: jax.Array) -> jax.Array:
    x32 = jnp.clip(x.astype(jnp.float32), -57344.0, 57344.0)
    return x32.astype(jnp.float8_e5m2).astype(jnp.float32)


def fp_cast(x: jax.Array, ebits: int, mbits: int) -> jax.Array:
    """Saturating cast to any (E, M); uses native dtypes where available."""
    if (ebits, mbits) == (4, 3):
        return cast_e4m3(x)
    if (ebits, mbits) == (5, 2):
        return cast_e5m2(x)
    if (ebits, mbits) == (2, 1):
        return fp4_round(x)
    return fp_round(x, ebits, mbits)


def e8m0_scale(amax: jax.Array, elem_emax: int) -> jax.Array:
    """OCP MX shared scale: 2^(floor(log2(amax)) - emax_elem), E8M0-clamped."""
    amax = jnp.abs(amax.astype(jnp.float32))
    _, fe = jnp.frexp(jnp.maximum(amax, jnp.finfo(jnp.float32).tiny))
    e = jnp.clip(fe - 1 - elem_emax, -127, 127)
    scale = jnp.ldexp(jnp.float32(1.0), e)
    return jnp.where(amax == 0.0, jnp.ones_like(scale), scale)


# --------------------------------------------------------------------------
# INT fake quant
# --------------------------------------------------------------------------


def int_scale_from_amax(
    amax: jax.Array, num_bits: int, unsigned: bool = False, narrow_range: bool = False
) -> jax.Array:
    bound = int_max_bound(num_bits, unsigned, narrow_range)
    amax = amax.astype(jnp.float32)
    scale = amax / bound
    # Zero-amax guard: degenerate channels quantize to 0 with scale 1.
    return jnp.where(amax == 0.0, jnp.ones_like(scale), scale)


def fake_quant_int(
    x: jax.Array,
    amax: jax.Array,
    num_bits: int = 8,
    unsigned: bool = False,
    narrow_range: bool = False,
) -> jax.Array:
    """Symmetric INT fake quant: round(x/scale) clamped, times scale.

    `amax` broadcasts against `x` (per-tensor scalar, per-channel shaped, or
    per-block shaped by the caller). RTNE rounding like the CUDA kernel
    (`tensor_quant_gpu.cu:58` uses rintf).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    scale = int_scale_from_amax(amax, num_bits, unsigned, narrow_range)
    lo = float(int_min_bound(num_bits, unsigned, narrow_range))
    hi = float(int_max_bound(num_bits, unsigned, narrow_range))
    q = jnp.clip(jnp.round(x32 / scale), lo, hi)
    return (q * scale).astype(dtype)


def real_quant_int(
    x: jax.Array,
    amax: jax.Array,
    num_bits: int = 8,
    unsigned: bool = False,
    narrow_range: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (int values as int8, fp32 scale). For num_bits<=8."""
    x32 = x.astype(jnp.float32)
    scale = int_scale_from_amax(amax, num_bits, unsigned, narrow_range)
    lo = float(int_min_bound(num_bits, unsigned, narrow_range))
    hi = float(int_max_bound(num_bits, unsigned, narrow_range))
    q = jnp.clip(jnp.round(x32 / scale), lo, hi).astype(jnp.int8)
    return q, scale


# --------------------------------------------------------------------------
# FP fake quant (scaled cast)
# --------------------------------------------------------------------------


def fake_quant_fp(
    x: jax.Array,
    amax: Optional[jax.Array],
    ebits: int,
    mbits: int,
) -> jax.Array:
    """Scaled mini-float fake quant (ScaledE4M3 semantics, generalized).

    With amax: scale so that amax maps onto the format's max representable,
    cast, rescale. Without amax: plain saturating cast (E4M3 "cast" mode —
    the `use_constant_amax` KV-cache presets).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    if amax is None:
        return fp_cast(x32, ebits, mbits).astype(dtype)
    maxval = fp_max_representable(ebits, mbits)
    amax32 = amax.astype(jnp.float32)
    scale = jnp.where(amax32 == 0.0, jnp.ones_like(amax32), amax32 / maxval)
    return (fp_cast(x32 / scale, ebits, mbits) * scale).astype(dtype)


# --------------------------------------------------------------------------
# Block reshaping helpers
# --------------------------------------------------------------------------


def _normalize_axes(sizes, ndim: int, shape: Optional[Sequence[int]] = None):
    """Resolve negative axes; clamp block size to the axis dim (a 128-block
    over a 64-wide tiny-model axis degrades to per-axis, like the reference)."""
    out = []
    for ax, bs in sizes:
        ax = ax % ndim
        if shape is not None:
            bs = min(bs, shape[ax])
        out.append((ax, bs))
    return sorted(out)


def _pad_to_blocks(x: jax.Array, norm) -> jax.Array:
    """Zero-pad blocked axes up to the next block multiple (conv fan-ins
    like I*kh*kw need not divide the block size; zero padding is exact for
    amax and is sliced off after quantization)."""
    pads = [(0, 0)] * x.ndim
    needs = False
    for ax, bs in norm:
        r = x.shape[ax] % bs
        if r:
            pads[ax] = (0, bs - r)
            needs = True
    return jnp.pad(x, pads) if needs else x


def block_reduce_amax(x: jax.Array, sizes: Sequence[tuple[int, int]]) -> jax.Array:
    """Per-block amax, keeping dims (amax broadcastable against x).

    `sizes` is ((axis, block_size), ...). Non-divisible axes are zero-padded
    to the next block multiple internally.
    """
    norm = _normalize_axes(sizes, x.ndim, x.shape)
    xp = _pad_to_blocks(x, norm)
    shape = []
    reduce_axes = []
    axmap = dict(norm)
    for ax in range(x.ndim):
        d = xp.shape[ax]
        if ax in axmap:
            bs = axmap[ax]
            shape.extend([d // bs, bs])
            reduce_axes.append(len(shape) - 1)
        else:
            shape.append(d)
    xb = xp.reshape(shape)
    amax = jnp.max(jnp.abs(xb), axis=tuple(reduce_axes), keepdims=True)
    # Broadcast back, collapse to padded shape, slice to x's shape.
    full = jnp.broadcast_to(amax, xb.shape).reshape(xp.shape)
    return full[tuple(slice(0, d) for d in x.shape)]


def block_amax_compact(x: jax.Array, sizes: Sequence[tuple[int, int]]) -> jax.Array:
    """Per-block amax in compact form: blocked axes become ceil(d/block)."""
    norm = _normalize_axes(sizes, x.ndim, x.shape)
    xp = _pad_to_blocks(x, norm)
    shape = []
    reduce_axes = []
    axmap = dict(norm)
    for ax in range(x.ndim):
        d = xp.shape[ax]
        if ax in axmap:
            bs = axmap[ax]
            shape.extend([d // bs, bs])
            reduce_axes.append(len(shape) - 1)
        else:
            shape.append(d)
    xb = xp.reshape(shape)
    return jnp.max(jnp.abs(xb), axis=tuple(reduce_axes))


def expand_block_scale(scale: jax.Array, x_shape: Sequence[int], sizes) -> jax.Array:
    """Expand a compact per-block scale to x_shape by repeating blocks
    (padded tails from non-divisible axes are sliced off)."""
    norm = _normalize_axes(sizes, len(x_shape), x_shape)
    out = scale
    for ax, bs in norm:
        out = jnp.repeat(out, bs, axis=ax)
    out = out[tuple(slice(0, d) for d in x_shape)]
    return jnp.broadcast_to(out, tuple(x_shape))


# --------------------------------------------------------------------------
# NVFP4 (E2M1 + E4M3 block scales + fp32 global scale)
# --------------------------------------------------------------------------

NVFP4_GLOBAL_DIV = 6.0 * 448.0  # amax / (6*448) — `nvfp4_tensor.py:205`


def nvfp4_global_scale(global_amax: jax.Array) -> jax.Array:
    ga = jnp.abs(global_amax.astype(jnp.float32))
    s = ga / NVFP4_GLOBAL_DIV
    return jnp.where(ga == 0.0, jnp.ones_like(s), s)


def nvfp4_block_scale(block_amax: jax.Array, global_scale: jax.Array) -> jax.Array:
    """Two-level NVFP4 scale: E4M3-roundtripped block scale times global.

    `fp8_quantize_scale` (`nvfp4_quant.py:92-110`): s_b =
    e4m3(block_amax / (6 * gs)) * gs, saturated at 448, near-zero forced to 1.
    """
    gs = global_scale.astype(jnp.float32)
    s = block_amax.astype(jnp.float32) / (6.0 * gs)
    s8 = cast_e4m3(s)
    s8 = jnp.where(s8 <= 0.0, jnp.ones_like(s8), s8)
    return s8 * gs


def fake_quant_nvfp4(
    x: jax.Array,
    block_size: int = 16,
    global_amax: Optional[jax.Array] = None,
    axis: int = -1,
) -> jax.Array:
    """NVFP4 fake quant along `axis` with dynamic per-block scales.

    If `global_amax` is None it is computed from x (fully dynamic, the
    activation path); for weights the calibrated per-tensor global amax is
    passed in.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    ax = axis % x.ndim
    if global_amax is None:
        global_amax = jnp.max(jnp.abs(x32))
    gs = nvfp4_global_scale(global_amax)
    sizes = ((ax, block_size),)
    bam = block_amax_compact(x32, sizes)
    sb = nvfp4_block_scale(bam, gs)
    sb_full = expand_block_scale(sb, x32.shape, sizes)
    y = fp4_round(x32 / sb_full) * sb_full
    return y.astype(dtype)


def real_quant_nvfp4(
    x: jax.Array,
    block_size: int = 16,
    global_amax: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Packed NVFP4 along the last axis.

    Returns (packed uint8 nibbles [..., N/2], per-block scales as
    float8_e4m3fn [..., N/block], fp32 global scale scalar). Decoded block
    scale = e4m3_value * global_scale. Nibble order matches the reference
    export layout `(q[...,1::2]<<4) | q[...,0::2]` (`nvfp4_tensor.py:337`).
    """
    x32 = x.astype(jnp.float32)
    if global_amax is None:
        global_amax = jnp.max(jnp.abs(x32))
    gs = nvfp4_global_scale(global_amax)
    sizes = ((x32.ndim - 1, block_size),)
    bam = block_amax_compact(x32, sizes)
    # E4M3 code of block scale (stored), value used = decoded * gs
    s_over = bam / (6.0 * gs)
    s8_val = cast_e4m3(s_over)
    s8_val = jnp.where(s8_val <= 0.0, jnp.ones_like(s8_val), s8_val)
    s8_code = jnp.clip(s8_val, -448.0, 448.0).astype(jnp.float8_e4m3fn)
    sb_full = expand_block_scale(s8_val * gs, x32.shape, sizes)
    q = fp4_round(x32 / sb_full)  # values in {0,±.5,±1,±1.5,±2,±3,±4,±6}
    codes = fp4_to_codes(q)
    packed = pack_nibbles(codes)
    return packed, s8_code, gs


def real_quant_nvfp4_planes(
    x: jax.Array,
    block_size: int = 16,
    global_amax: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """PLANE-packed NVFP4 along the last axis (serving KV-cache layout).

    Byte j holds codes for logical elements j (low nibble) and j + N/2
    (high nibble), so the Pallas KV decode kernel unpacks with two masked
    copies and no element interleave (`ops/pallas/kv_attention.py`).
    Quantization math is identical to `real_quant_nvfp4` (reference
    contract `nvfp4_quant.py:92-110`); only the byte order differs.

    Returns (planes uint8 [..., N/2], E4M3 block-scale BITS as uint8
    [..., N/block], fp32 global scale scalar).
    """
    x32 = x.astype(jnp.float32)
    if global_amax is None:
        global_amax = jnp.max(jnp.abs(x32))
    gs = nvfp4_global_scale(global_amax)
    sizes = ((x32.ndim - 1, block_size),)
    bam = block_amax_compact(x32, sizes)
    s8_val = cast_e4m3(bam / (6.0 * gs))
    s8_val = jnp.where(s8_val <= 0.0, jnp.ones_like(s8_val), s8_val)
    s8_bits = jax.lax.bitcast_convert_type(
        jnp.clip(s8_val, -448.0, 448.0).astype(jnp.float8_e4m3fn), jnp.uint8)
    sb_full = expand_block_scale(s8_val * gs, x32.shape, sizes)
    codes = fp4_to_codes(fp4_round(x32 / sb_full))
    h = x32.shape[-1] // 2
    planes = (codes[..., :h] | (codes[..., h:] << 4)).astype(jnp.uint8)
    return planes, s8_bits, gs


def nvfp4_planes_code_load(planes: jax.Array, scale_bits: jax.Array,
                           out_dtype=jnp.float32) -> jax.Array:
    """Dequantize plane-packed NVFP4 to CODE-DOMAIN values (E2M1 value x
    E4M3 block scale, NO global scale) — the XLA-side mirror of the Pallas
    in-kernel decode, used for the current decode token and parity tests."""
    h = planes.shape[-1]
    codes = jnp.concatenate([planes & 0xF, (planes >> 4) & 0xF], axis=-1)
    vals = codes_to_fp4(codes)
    s = jax.lax.bitcast_convert_type(
        scale_bits, jnp.float8_e4m3fn).astype(jnp.float32)
    block = (2 * h) // s.shape[-1]
    sexp = expand_block_scale(s, vals.shape, ((vals.ndim - 1, block),))
    return (vals * sexp).astype(out_dtype)


def fp4_to_codes(q: jax.Array) -> jax.Array:
    """Map E2M1 values to 4-bit codes (sign bit | 3-bit magnitude index)."""
    mags = jnp.array(E2M1_VALUES, dtype=jnp.float32)
    m = jnp.abs(q.astype(jnp.float32))
    idx = jnp.argmin(jnp.abs(m[..., None] - mags), axis=-1).astype(jnp.uint8)
    sign = (q < 0).astype(jnp.uint8) << 3
    return (idx | sign).astype(jnp.uint8)


def codes_to_fp4(codes: jax.Array) -> jax.Array:
    mags = jnp.array(E2M1_VALUES, dtype=jnp.float32)
    idx = (codes & 0x7).astype(jnp.int32)
    sign = jnp.where((codes & 0x8) != 0, -1.0, 1.0)
    return sign * mags[idx]


def pack_nibbles(codes: jax.Array) -> jax.Array:
    """Pack 4-bit codes pairwise along the last axis: out = hi<<4 | lo where
    lo = even index, hi = odd index (reference layout, `nvfp4_tensor.py:337`)."""
    lo = codes[..., 0::2]
    hi = codes[..., 1::2]
    return ((hi << 4) | (lo & 0xF)).astype(jnp.uint8)


def unpack_nibbles(packed: jax.Array) -> jax.Array:
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], packed.shape[-1] * 2)


# --------------------------------------------------------------------------
# MX formats (shared E8M0 scale per 32-block)
# --------------------------------------------------------------------------


def fake_quant_mx(
    x: jax.Array,
    ebits: int,
    mbits: int,
    block_size: int = 32,
    axis: int = -1,
) -> jax.Array:
    """MXFP4/6/8 fake quant: per-block E8M0 scale, element cast to (E, M)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    ax = axis % x.ndim
    sizes = ((ax, block_size),)
    bam = block_amax_compact(x32, sizes)
    scale = e8m0_scale(bam, fp_emax(ebits, mbits))
    s_full = expand_block_scale(scale, x32.shape, sizes)
    y = fp_cast(x32 / s_full, ebits, mbits) * s_full
    return y.astype(dtype)


# --------------------------------------------------------------------------
# NF4 (normal-float 4-bit, QLoRA) with double quantization
# --------------------------------------------------------------------------

# Standard NF4 codebook (16 quantiles of N(0,1), normalized to [-1, 1]).
NF4_TABLE = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
    0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
)


def fake_quant_nf4(x: jax.Array, block_size: int = 64, axis: int = -1) -> jax.Array:
    """NF4 fake quant: per-block absmax scale, nearest NF4 codebook value."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    ax = axis % x.ndim
    sizes = ((ax, block_size),)
    bam = block_amax_compact(x32, sizes)
    bam = jnp.where(bam == 0.0, jnp.ones_like(bam), bam)
    s_full = expand_block_scale(bam, x32.shape, sizes)
    xn = x32 / s_full
    table = jnp.array(NF4_TABLE, dtype=jnp.float32)
    idx = jnp.argmin(jnp.abs(xn[..., None] - table), axis=-1)
    return (table[idx] * s_full).astype(dtype)


def real_quant_nf4(
    x: jax.Array, block_size: int = 64, scale_block: int = 256
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Packed NF4 with double-quantized scales (QLoRA layout).

    Returns (packed nibbles, int8 quantized scales, per-group scale-of-scales
    fp32, per-tensor scale mean fp32).
    """
    x32 = x.astype(jnp.float32)
    flat = x32.reshape(-1, block_size)
    bam = jnp.max(jnp.abs(flat), axis=-1)
    bam_safe = jnp.where(bam == 0.0, jnp.ones_like(bam), bam)
    xn = flat / bam_safe[:, None]
    table = jnp.array(NF4_TABLE, dtype=jnp.float32)
    idx = jnp.argmin(jnp.abs(xn[..., None] - table), axis=-1).astype(jnp.uint8)
    packed = pack_nibbles(idx.reshape(x32.shape[:-1] + (-1,)).reshape(-1, block_size))
    # Double quantization: int8-quantize the per-block scales in groups.
    smean = jnp.mean(bam)
    centered = bam - smean
    g = centered.reshape(-1, scale_block) if centered.size % scale_block == 0 else centered.reshape(1, -1)
    gmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    gmax = jnp.where(gmax == 0.0, jnp.ones_like(gmax), gmax)
    s_q = jnp.clip(jnp.round(g / (gmax / 127.0)), -128, 127).astype(jnp.int8)
    return packed, s_q, gmax.squeeze(-1) / 127.0, smean


# --------------------------------------------------------------------------
# INT4 pack/unpack (uint8 nibbles, offset-binary like the reference exporter)
# --------------------------------------------------------------------------


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack signed int4 values [-8, 7] into uint8 nibbles (two's complement)."""
    u = (q.astype(jnp.int32) & 0xF).astype(jnp.uint8)
    return pack_nibbles(u)


def unpack_int4(packed: jax.Array) -> jax.Array:
    u = unpack_nibbles(packed).astype(jnp.int32)
    return jnp.where(u >= 8, u - 16, u).astype(jnp.int8)
