"""Real-quant compression: pack calibrated fake-quant weights (`mtq.compress`).

Reference: `modelopt/torch/quantization/compress.py:53,196` converts
calibrated weights into packed QTensors + scales, dispatched to fused GEMMs.
TPU-first design decisions:

 - 4-bit values use *plane packing*: byte[o, k] = nibble(w[o + O/2, k]) << 4
   | nibble(w[o, k]) for o < O/2. Unpacking in a kernel yields two
   contiguous half-outputs (rows [0, O/2) and [O/2, O)) — no cross-lane
   interleave on the big weight tile, and the matmul writes two contiguous
   output halves. (The reference's nibble layout interleaves adjacent
   elements, `nvfp4_tensor.py:337`; export re-packs to that layout.)
 - Scales are stored split per plane, so each kernel tile reads its own
   scale rows.
 - Compressed tensors remain a pytree: {"kind": static str (in the layout),
   arrays...}.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..ops import numerics
from . import quantizer as Q
from .ptq import QuantizedModel


def _int4_nibbles(q: jax.Array) -> jax.Array:
    """Signed int4 [-8, 7] -> low nibble uint8."""
    return (q.astype(jnp.int32) & 0xF).astype(jnp.uint8)


def plane_pack(nibbles: jax.Array) -> jax.Array:
    """[O, K] 4-bit codes -> [O/2, K] bytes, rows (o, o + O/2) per byte."""
    O = nibbles.shape[-2]
    lo = nibbles[..., : O // 2, :]
    hi = nibbles[..., O // 2 :, :]
    return ((hi << 4) | (lo & 0xF)).astype(jnp.uint8)


def plane_unpack_int4(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[O/2, K] bytes -> (rows [0, O/2), rows [O/2, O)) as signed int8."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = ((packed >> 4) & 0xF).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return lo, hi


def compress_weight(
    w: jax.Array,  # [O, K] (or [L, O, K] stacked)
    cfg: Q.QuantizerConfig,
    state: Optional[Q.QuantizerState],
) -> tuple[str, dict]:
    """Pack one weight per its quantizer config. Returns (kind, arrays).

    Kinds: "bf16" (disabled), "int8" (per-channel), "int4" (block scales,
    plane-packed), "nvfp4" (E2M1 planes + E4M3 block scales + global),
    "fp8" (per-tensor scale, E4M3 storage).
    """
    base = cfg.sequential[0] if cfg.sequential else cfg
    if not cfg.enable:
        return "bf16", {"w": w.astype(jnp.bfloat16)}

    if (base.is_fp and base.block is not None and base.num_bits == (2, 1)
            and base.block.scale_bits == (4, 3)):
        # NVFP4 (E4M3 block scales). MX formats (E8M0 scales) fall through
        # to the generic path below.
        bsz = dict(base.block.sizes).get(-1, 16)
        bsz = min(bsz, w.shape[-1])
        g_amax = state.amax if state is not None and state.amax is not None else jnp.max(jnp.abs(w))
        gs = numerics.nvfp4_global_scale(g_amax)
        bam = numerics.block_amax_compact(w.astype(jnp.float32), ((-1, bsz),))
        s_val = numerics.cast_e4m3(bam / (6.0 * gs[..., None, None] if gs.ndim else 6.0 * gs))
        s_val = jnp.where(s_val <= 0.0, jnp.ones_like(s_val), s_val)
        sb_full = numerics.expand_block_scale(
            s_val * (gs[..., None, None] if gs.ndim else gs), w.shape, ((-1, bsz),)
        )
        qv = numerics.fp4_round(w.astype(jnp.float32) / sb_full)
        codes = numerics.fp4_to_codes(qv)
        packed = plane_pack(codes)
        O = w.shape[-2]
        return "nvfp4", {
            "packed": packed,
            "scale_lo": s_val[..., : O // 2, :].astype(jnp.float8_e4m3fn),
            "scale_hi": s_val[..., O // 2 :, :].astype(jnp.float8_e4m3fn),
            "global_scale": gs.astype(jnp.float32),
        }

    if (base.is_fp and base.num_bits == (4, 3)
            and (base.block is None or base.block.scale_bits != (8, 0))):
        # Per-tensor FP8. MXFP8 shares num_bits (4,3) but carries E8M0
        # per-32-block scales — it must fall through to the MX branch below.
        amax = state.amax if state is not None else None
        if cfg.sequential and isinstance(amax, tuple):
            amax = amax[-1]
        if amax is None:
            amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 2, w.ndim)))
        scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 448.0
        sc = scale[..., None, None] if scale.ndim == w.ndim - 2 else scale
        qw = jnp.clip(w.astype(jnp.float32) / sc, -448.0, 448.0).astype(jnp.float8_e4m3fn)
        return "fp8", {"q": qw, "scale": scale.astype(jnp.float32)}

    if not base.is_fp and base.num_bits == 4:
        amax = state.amax if state is not None else None
        if cfg.sequential and isinstance(amax, tuple):
            amax = amax[0]
        bsz = dict(base.block.sizes).get(-1, 128) if base.block else w.shape[-1]
        bsz = min(bsz, w.shape[-1])
        if amax is None:
            amax = numerics.block_amax_compact(w.astype(jnp.float32), ((-1, bsz),))
        scale = amax.astype(jnp.float32) / 7.0  # [.., O, K/bsz]
        scale = jnp.where(amax == 0.0, jnp.ones_like(scale), scale)
        s_full = numerics.expand_block_scale(scale, w.shape, ((-1, bsz),))
        q = jnp.clip(jnp.round(w.astype(jnp.float32) / s_full), -8, 7)
        packed = plane_pack(_int4_nibbles(q))
        O = w.shape[-2]
        return "int4", {
            "packed": packed,
            "scale_lo": scale[..., : O // 2, :].astype(jnp.float32),
            "scale_hi": scale[..., O // 2 :, :].astype(jnp.float32),
        }

    if base.is_fp and base.block is not None and base.block.scale_bits == (8, 0):
        e, m = base.num_bits
        bsz = min(dict(base.block.sizes).get(-1, 32), w.shape[-1])
        if (e, m) == (2, 1) and w.shape[-1] % bsz == 0 and w.shape[-2] % 2 == 0:
            # MXFP4: E2M1 elements plane-packed (same grid as NVFP4) +
            # per-block E8M0 scale stored as its int8 EXPONENT — 4 bits/elem
            # served instead of the former bf16 fake-quant fallback.
            w32 = w.astype(jnp.float32)
            bam = numerics.block_amax_compact(w32, ((-1, bsz),))
            scale = numerics.e8m0_scale(bam, numerics.fp_emax(2, 1))
            s_full = numerics.expand_block_scale(scale, w32.shape, ((-1, bsz),))
            qv = numerics.fp4_round(w32 / s_full)
            packed = plane_pack(numerics.fp4_to_codes(qv))
            _, fe = jnp.frexp(scale)
            O = w.shape[-2]
            exp = (fe - 1).astype(jnp.int8)  # scale = 2^exp exactly
            return "mxfp4", {
                "packed": packed,
                "exp_lo": exp[..., : O // 2, :],
                "exp_hi": exp[..., O // 2 :, :],
            }
        # MXFP6/MXFP8 (and ragged shapes): store the fake-quantized weight in
        # bf16 — the values ARE the MX grid points, numerics stay exact.
        wq = numerics.fake_quant_mx(w.astype(jnp.float32), e, m, bsz)
        return "bf16", {"w": wq.astype(jnp.bfloat16)}

    if not base.is_fp and base.num_bits == 8:
        amax = state.amax if state is not None else None
        if amax is None:
            amax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
        scale = numerics.int_scale_from_amax(amax, 8)
        q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)
        return "int8", {"q": q, "scale": scale.astype(jnp.float32)}

    return "bf16", {"w": w.astype(jnp.bfloat16)}


def _map_leading(fn, *arrays):
    """Apply `fn` over all leading (stacked layer/expert) axes SEQUENTIALLY.

    vmap here batches the conversion's [O, K]-sized intermediates across all
    L layers at once — for an 8B model that is >12 GB of transients and
    OOMed the 16 GB chip at engine init (2026-08-18). lax.map keeps one
    layer's intermediates live at a time; conversion is one-time setup so
    the serialization is free."""
    from ..ops.pallas import qmm as qmm_mod

    qmm_mod._bitcast_order()  # probe kernel reads concrete values — must
    # run (and cache) EAGERLY before fn is traced under lax.map
    extra = arrays[0].ndim - 2
    if extra == 0:
        return fn(*arrays)
    lead = arrays[0].shape[:extra]
    flat = [a.reshape((-1,) + a.shape[extra:]) for a in arrays]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(flat))
    return tuple(o.reshape(lead + o.shape[1:]) for o in out)


def convert_nvfp4_perm(cm: "CompressedModel") -> "CompressedModel":
    """One-time layout conversion: nvfp4 -> nvfp4p (K-permuted packed lanes
    + bf16 scales) for the faster full-depth-dot serving kernel
    (`ops/pallas/qmm.qmm_nvfp4_perm`). Stacked [L, O/2, K] arrays permute on
    the last axis; everything else passes through."""
    from ..ops.pallas import qmm as qmm_mod

    new_layers = dict(cm.params["layers"])
    kinds = dict(cm.kinds)
    for name, kind in cm.kinds.items():
        if kind != "nvfp4":
            continue
        arr = dict(new_layers[name])
        K = arr["packed"].shape[-1]
        tk = qmm_mod.nvfp4_perm_tile(K)
        arr["packed"] = qmm_mod.permute_k(arr["packed"], -1, tk)
        arr["scale_lo"] = arr["scale_lo"].astype(jnp.float32).astype(jnp.bfloat16)
        arr["scale_hi"] = arr["scale_hi"].astype(jnp.float32).astype(jnp.bfloat16)
        new_layers[name] = arr
        kinds[name] = "nvfp4p"
    params = dict(cm.params)
    params["layers"] = new_layers
    return dataclasses.replace(cm, params=params, kinds=kinds)


def word_convert_site(kind: str, arr: dict, layout: str = "word") -> tuple[str, dict]:
    """Convert ONE packed site (stacked leading axes ok) to a fused-kernel
    serving layout.

    layout "word":  int4 -> int4w, nvfp4 -> nvfp4w, mxfp4 -> mxfp4w
    layout "word2": int4 -> int4w2, nvfp4 -> nvfp4w2, mxfp4 -> mxfp4w2
                    (4 bytes per i32 lane, `qmm.qmm_*_word2`)
    layout "bd2":   int4 -> int4b2 (block-major batched-dot layout,
                    `qmm.qmm_int4_bd2`); falls back to word2 when the
                    shape is unsupported (`qmm.bd2_supported`). nvfp4/mxfp4
                    get word2 (bd2 needs 128-wide blocks).
    Other kinds pass through unchanged. Shared by the whole-model
    convert_* helpers below and by `serve/tp.py` (which packs each TP
    shard chunk and each EP expert slice independently)."""
    import functools

    from ..ops.pallas import qmm as qmm_mod

    if kind == "nvfp4":
        if layout == "i8":
            # W8A8-class serving of an NVFP4 checkpoint: the E2M1 x E4M3
            # dequant values re-encode as per-channel int8 codes for the
            # s8 x s8 MXU path — the reference's own W4A8 recast move
            # (`w4a8_awq_beta.yaml`: INT4 weights re-cast through FP8 for
            # the 8-bit tensor-core path) applied TPU-natively. Re-encode
            # error is <= amax_row/254, ~1/20 of the E2M1 grid step, and
            # is pinned by tests/test_compress_serve.py. HBM weight bytes
            # double vs the 4-bit layouts (8-bit codes); the win is the
            # native 8-bit MXU serving class (int4-a8 lesson, r4 chain3).
            def _one(packed, slo, shi, gs):
                w = decompress_weight(
                    "nvfp4", {"packed": packed, "scale_lo": slo,
                              "scale_hi": shi, "global_scale": gs},
                    out_dtype=jnp.float32)
                amax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
                scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
                q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
                return q, scale.astype(jnp.float32)

            # per-LAYER conversion (_map_leading is sequential): the stacked
            # [L, O, K] f32 decompress was a ~7.5 GB on-device temp per site
            # and timed out the r5 grid's i8 cell
            q, scale = _map_leading(
                _one, arr["packed"], arr["scale_lo"], arr["scale_hi"],
                arr["global_scale"])
            return "int8a8", {"q": q, "scale": scale}
        if layout == "bd4":
            bsz = arr["packed"].shape[-1] // arr["scale_lo"].shape[-1]
            O = 2 * arr["packed"].shape[-2]
            K = arr["packed"].shape[-1]
            # nvfp4_bd4_pack below runs with its default block_size=16, so
            # only take this branch for 16-blocks (bd4_supported also
            # accepts 32/64, which are mxfp4's) — anything else falls to
            # the word2 path like other unsupported shapes
            if bsz == 16 and qmm_mod.bd4_supported(O, K, bsz):
                # block-major O-on-lanes deep-dot layout
                # (qmm.qmm_nvfp4_bd4); falls back to word2 below on
                # unsupported shapes, like bd2/a8 do for int4.
                qmm_mod._bitcast_order()  # probe caches before lax.map trace
                packed, scales = _map_leading(
                    qmm_mod.nvfp4_bd4_pack, arr["packed"],
                    arr["scale_lo"], arr["scale_hi"])
                return "nvfp4b4", {
                    "packed": packed, "scales": scales,
                    "global_scale": arr["global_scale"],
                }
        pack = (qmm_mod.nvfp4_word2_pack if layout in ("word2", "bd2", "bd4")
                else qmm_mod.nvfp4_word_pack)
        packed, scales = _map_leading(
            pack, arr["packed"], arr["scale_lo"], arr["scale_hi"]
        )
        return ("nvfp4w2" if layout in ("word2", "bd2", "bd4") else "nvfp4w"), {
            "packed": packed, "scales": scales,
            "global_scale": arr["global_scale"],
        }
    if kind == "int4" and layout == "xla":
        # XLA-native s4 serving (qmm.qmm_int4_xla): plane nibbles -> uint8
        # [O, K/2] bytes in the backend's bitcast-convert element order +
        # merged [O, G] f32 block scales. Storage stays uint8 (s4 arrays
        # crash axon host transfers AND jit-arg device_put); the s4 view is
        # created by one bitcast inside the serving jit. Conversion
        # commutes with TP sharding since bytes pack k-adjacent pairs.
        qmm_mod._s4_nibble_order()  # probe reads concrete values — cache
        # eagerly before tracing under lax.map

        def to_xla(packed, s_lo, s_hi):
            lo, hi = plane_unpack_int4(packed)
            q = jnp.concatenate([lo, hi], axis=-2)
            return qmm_mod.int4_xla_pack(q), jnp.concatenate(
                [s_lo, s_hi], axis=-2).astype(jnp.float32)

        qpacked, scale = _map_leading(
            to_xla, arr["packed"], arr["scale_lo"], arr["scale_hi"])
        return "int4x", {"qpacked": qpacked, "scale": scale}
    if kind == "int4":
        bsz = arr["packed"].shape[-1] // arr["scale_lo"].shape[-1]
        O = 2 * arr["packed"].shape[-2]
        if layout == "a8" and qmm_mod.w48_supported(O, bsz):
            # W4A8 native serving (qmm.qmm_int4_w48): int8 code decode +
            # s8 x s8 MXU dots with per-token int8 activations at serve
            # time (reference W4A8 rows, benchmark.md:23-25). Falls back
            # to word2 below on unsupported shapes, like bd2.
            qmm_mod._bitcast_order_i8()  # probe caches before lax.map trace
            packed, scales = _map_leading(
                qmm_mod.int4_w48_pack, arr["packed"],
                arr["scale_lo"], arr["scale_hi"])
            return "int4w48", {"packed": packed, "scales": scales}
        if layout == "bd2" and qmm_mod.bd2_supported(O, bsz):
            packed, scales = _map_leading(
                qmm_mod.int4_bd2_pack, arr["packed"],
                arr["scale_lo"], arr["scale_hi"])
            return "int4b2", {"packed": packed, "scales": scales}
        pack = (qmm_mod.int4_word2_pack if layout in ("word2", "bd2", "a8")
                else qmm_mod.int4_word_pack)
        packed, scales = _map_leading(
            pack, arr["packed"], arr["scale_lo"], arr["scale_hi"]
        )
        return ("int4w2" if layout in ("word2", "bd2", "a8") else "int4w"), {
            "packed": packed, "scales": scales}
    if kind == "mxfp4":
        bsz = arr["packed"].shape[-1] // arr["exp_lo"].shape[-1]
        if layout == "bd4":
            O = 2 * arr["packed"].shape[-2]
            K = arr["packed"].shape[-1]
            if qmm_mod.bd4_supported(O, K, bsz):
                # E8M0 exponents -> exact f32 powers of two; the pack's
                # f32->bf16 cast is exact in the normal range
                qmm_mod._bitcast_order()
                slo = jnp.ldexp(jnp.float32(1.0), arr["exp_lo"].astype(jnp.int32))
                shi = jnp.ldexp(jnp.float32(1.0), arr["exp_hi"].astype(jnp.int32))
                pack = functools.partial(qmm_mod.nvfp4_bd4_pack, block_size=bsz)
                packed, scales = _map_leading(pack, arr["packed"], slo, shi)
                return "mxfp4b4", {"packed": packed, "scales": scales}
        base = (qmm_mod.nvfp4_word2_pack if layout in ("word2", "bd2", "bd4")
                else qmm_mod.nvfp4_word_pack)
        pack = functools.partial(base, block_size=bsz)
        packed, _ = _map_leading(
            pack,
            arr["packed"],
            jnp.zeros_like(arr["exp_lo"], jnp.float32),
            jnp.zeros_like(arr["exp_hi"], jnp.float32),
        )
        scales = _exp_to_bf16(
            jnp.concatenate([arr["exp_lo"], arr["exp_hi"]], axis=-2))
        kind2 = "mxfp4w2" if layout in ("word2", "bd2", "bd4") else "mxfp4w"
        return kind2, {"packed": packed, "scales": scales}
    return kind, arr


def _exp_to_bf16(e):
    """E8M0 exponent -> the exact bf16 power of two 2^e: bf16(2^e) has bit
    pattern (e + 127) << 7 (exponents clamp to the normal range)."""
    bits = (jnp.clip(e.astype(jnp.int32), -126, 127) + 127) << 7
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)


def convert_packed_layouts(
    cm: "CompressedModel",
    nvfp4: str = "word",
    int4: str = "word",
    mxfp4: str = "word",
) -> "CompressedModel":
    """One-time serving-layout conversion for every packed 4-bit site.

    Layout names per format follow `EngineConfig.{nvfp4,int4}_layout`;
    "blockdot" keeps the plane layout (the blockdot kernels consume it
    directly)."""
    want = {"nvfp4": nvfp4, "int4": int4, "mxfp4": mxfp4}
    new_layers = dict(cm.params["layers"])
    kinds = dict(cm.kinds)
    for name, kind in cm.kinds.items():
        layout = want.get(kind)
        if layout is None or layout == "blockdot":
            continue
        kinds[name], new_layers[name] = word_convert_site(
            kind, new_layers[name], layout)
    params = dict(cm.params)
    params["layers"] = new_layers
    return dataclasses.replace(cm, params=params, kinds=kinds)


def convert_nvfp4_word(cm: "CompressedModel") -> "CompressedModel":
    """One-time layout conversion: nvfp4 -> nvfp4w (row-pair bytes + SWAR
    word-decode serving kernel, `ops/pallas/qmm.qmm_nvfp4_word`). Stacked
    [L, O/2, K] arrays convert per-layer via vmap; everything else passes."""
    new_layers = dict(cm.params["layers"])
    kinds = dict(cm.kinds)
    for name, kind in cm.kinds.items():
        if kind != "nvfp4":
            continue
        kinds[name], new_layers[name] = word_convert_site(kind, new_layers[name])
    params = dict(cm.params)
    params["layers"] = new_layers
    return dataclasses.replace(cm, params=params, kinds=kinds)


def convert_mxfp4_word(cm: "CompressedModel") -> "CompressedModel":
    """mxfp4 -> mxfp4w: the E2M1 planes repack exactly like nvfp4w and the
    E8M0 exponents become bf16 scale BITS with one shift (`_exp_to_bf16`),
    so the scale conversion is free and exact."""
    new_layers = dict(cm.params["layers"])
    kinds = dict(cm.kinds)
    for name, kind in cm.kinds.items():
        if kind != "mxfp4":
            continue
        kinds[name], new_layers[name] = word_convert_site(kind, new_layers[name])
    params = dict(cm.params)
    params["layers"] = new_layers
    return dataclasses.replace(cm, params=params, kinds=kinds)


def convert_int4_word(cm: "CompressedModel") -> "CompressedModel":
    """One-time layout conversion: int4 -> int4w (row-pair bytes +
    magic-number word-decode kernel, `ops/pallas/qmm.qmm_int4_word`).
    Block scales round to bf16 (they multiply bf16 weights pre-dot), a
    <=0.4% relative perturbation bounded by the serving parity tests."""
    new_layers = dict(cm.params["layers"])
    kinds = dict(cm.kinds)
    for name, kind in cm.kinds.items():
        if kind != "int4":
            continue
        kinds[name], new_layers[name] = word_convert_site(kind, new_layers[name])
    params = dict(cm.params)
    params["layers"] = new_layers
    return dataclasses.replace(cm, params=params, kinds=kinds)


def _infer_bsz(K: int, nblk: int) -> int:
    """Block size from (K, n_blocks) allowing a ragged (padded) last block:
    exact division wins; otherwise the next power of two >= K/nblk (the
    compress path's block sizes are powers of two)."""
    if K % nblk == 0:
        return K // nblk
    b = 1
    while b * nblk < K:
        b *= 2
    return b


def decompress_weight(kind: str, arrays: dict, out_dtype=jnp.bfloat16) -> jax.Array:
    """Reference dequantization (correctness baseline for the fused kernels)."""
    if kind == "bf16":
        return arrays["w"].astype(out_dtype)
    if kind in ("int8", "int8a8"):
        return (arrays["q"].astype(jnp.float32) * arrays["scale"]).astype(out_dtype)
    if kind == "fp8":
        sc = arrays["scale"]
        sc = sc[..., None, None] if sc.ndim == arrays["q"].ndim - 2 else sc
        return (arrays["q"].astype(jnp.float32) * sc).astype(out_dtype)
    if kind == "int4":
        lo, hi = plane_unpack_int4(arrays["packed"])
        K = arrays["packed"].shape[-1]
        nblk = arrays["scale_lo"].shape[-1]
        bsz = _infer_bsz(K, nblk)

        def ex(sc, plane):
            if K % bsz == 0:
                return numerics.expand_block_scale(sc, plane.shape, ((-1, bsz),))
            # ragged last block (e.g. K=704 with 128-blocks): expand on the
            # padded width, slice back — floor-dividing the shapes would
            # silently mis-infer bsz (the r5 anchor-serving bug)
            shp = plane.shape[:-1] + (nblk * bsz,)
            return numerics.expand_block_scale(sc, shp, ((-1, bsz),))[..., :K]

        lo_f = lo.astype(jnp.float32) * ex(arrays["scale_lo"], lo)
        hi_f = hi.astype(jnp.float32) * ex(arrays["scale_hi"], hi)
        return jnp.concatenate([lo_f, hi_f], axis=-2).astype(out_dtype)
    if kind == "int4x":
        # Unpack with u8 arithmetic (no s4 dtype — safe outside jit on axon).
        from ..ops.pallas import qmm as qmm_mod

        p = arrays["qpacked"].astype(jnp.int32)
        e0 = ((p & 0xF) ^ 8) - 8
        e1 = (((p >> 4) & 0xF) ^ 8) - 8
        if qmm_mod._s4_nibble_order() == "high_first":
            e0, e1 = e1, e0
        q = jnp.stack([e0, e1], axis=-1).reshape(
            *p.shape[:-1], p.shape[-1] * 2).astype(jnp.float32)
        sc = arrays["scale"]
        bsz = q.shape[-1] // sc.shape[-1]
        w = q * numerics.expand_block_scale(
            sc.astype(jnp.float32), q.shape, ((-1, bsz),))
        return w.astype(out_dtype)
    if kind == "nvfp4":
        p = arrays["packed"]
        lo = numerics.codes_to_fp4(p & 0xF)
        hi = numerics.codes_to_fp4((p >> 4) & 0xF)
        bsz = arrays["packed"].shape[-1] // arrays["scale_lo"].shape[-1]
        gs = arrays["global_scale"]
        gsb = gs[..., None, None] if gs.ndim else gs
        lo_f = lo * numerics.expand_block_scale(
            arrays["scale_lo"].astype(jnp.float32) * gsb, lo.shape, ((-1, bsz),)
        )
        hi_f = hi * numerics.expand_block_scale(
            arrays["scale_hi"].astype(jnp.float32) * gsb, hi.shape, ((-1, bsz),)
        )
        return jnp.concatenate([lo_f, hi_f], axis=-2).astype(out_dtype)
    if kind == "mxfp4":
        p = arrays["packed"]
        lo = numerics.codes_to_fp4(p & 0xF)
        hi = numerics.codes_to_fp4((p >> 4) & 0xF)
        bsz = p.shape[-1] // arrays["exp_lo"].shape[-1]
        s_lo = jnp.ldexp(jnp.float32(1.0), arrays["exp_lo"].astype(jnp.int32))
        s_hi = jnp.ldexp(jnp.float32(1.0), arrays["exp_hi"].astype(jnp.int32))
        lo_f = lo * numerics.expand_block_scale(s_lo, lo.shape, ((-1, bsz),))
        hi_f = hi * numerics.expand_block_scale(s_hi, hi.shape, ((-1, bsz),))
        return jnp.concatenate([lo_f, hi_f], axis=-2).astype(out_dtype)
    if kind == "nvfp4p":
        from ..ops.pallas import qmm as qmm_mod

        K = arrays["packed"].shape[-1]
        tk = qmm_mod.nvfp4_perm_tile(K)
        arrs = dict(arrays)
        arrs["packed"] = qmm_mod.unpermute_k(arrays["packed"], -1, tk)
        return decompress_weight("nvfp4", arrs, out_dtype)
    if kind == "int4w48":
        # inverse of qmm._w48_byte_pack: block-major -> [O/8, K] words,
        # bytes per `_bitcast_order_i8()`, even/odd nibbles = row halves
        from ..ops.pallas import qmm as qmm_mod

        p = arrays["packed"]
        nd = p.ndim
        perm = tuple(range(nd - 3)) + (nd - 2, nd - 3, nd - 1)
        p = p.transpose(perm)
        p = p.reshape(p.shape[:-2] + (p.shape[-2] * p.shape[-1],))
        K = p.shape[-1]
        nblk = arrays["scales"].shape[-2]
        bsz = K // nblk
        O = p.shape[-2] * 8
        to = qmm_mod._word2_tile_o(O)
        lead = p.shape[:-2]
        R = to // 8
        pt = p.reshape(lead + (O // to, R, K))

        def half(shift):
            bytes_ = [(pt >> (8 * b + shift)) & 0xF for b in range(4)]
            h = jnp.stack(bytes_, axis=-2)  # [.., O/to, R, 4, K] = [r, b]
            if qmm_mod._bitcast_order_i8() == "interleaved":
                return h.reshape(lead + (O // to, to // 2, K))  # row 4r+b
            return jnp.swapaxes(h, -3, -2).reshape(
                lead + (O // to, to // 2, K))  # row b*R + r

        codes = jnp.concatenate([half(0), half(4)], axis=-2).reshape(
            lead + (O, K))
        vals = codes.astype(jnp.float32) - 8.0  # pack stored u = v + 8
        sc = jnp.swapaxes(arrays["scales"].astype(jnp.float32), -1, -2)
        w = vals * numerics.expand_block_scale(sc, vals.shape, ((-1, bsz),))
        return w.astype(out_dtype)
    if kind in ("nvfp4b4", "mxfp4b4"):
        # inverse of qmm.nvfp4_bd4_pack: [.., K/64, 8, O] words -> codes,
        # group g of half h holds k = B*64 + g*16 + j (j order per
        # `_bitcast_order()`). mxfp4b4 stores its wider-block scales
        # duplicated per 16-group, so expanding at 16-granularity is
        # equivalent (and it has no global scale).
        from ..ops.pallas import qmm as qmm_mod

        p = jnp.moveaxis(arrays["packed"], -1, -3)  # [.., O, B, 8]
        lead = p.shape[:-3]
        O, B = p.shape[-3], p.shape[-2]
        K = B * 64
        groups = []
        for g in range(4):
            lo = (p >> (4 * g)) & 0xF
            hi = (p >> (16 + 4 * g)) & 0xF
            if qmm_mod._bitcast_order() == "interleaved":
                blk = jnp.stack([lo, hi], axis=-1).reshape(
                    lead + (O, B, 16))          # j = 2r + h
            else:
                blk = jnp.concatenate([lo, hi], axis=-1)  # j = h*8 + r
            groups.append(blk)
        codes = jnp.stack(groups, axis=-2).reshape(lead + (O, K))
        m = codes & 7
        codes = (codes & 8) | (m ^ (m < 2).astype(codes.dtype))  # unswap
        vals = numerics.codes_to_fp4(codes)
        sc = jnp.moveaxis(arrays["scales"], (-3, -1), (-1, -3))  # [.., O, B, 4]
        sc = sc.reshape(lead + (O, K // 16)).astype(jnp.float32)
        gs = arrays.get("global_scale")
        if gs is not None:
            sc = sc * (gs[..., None, None] if gs.ndim else gs)
        w = vals * numerics.expand_block_scale(sc, vals.shape, ((-1, 16),))
        return w.astype(out_dtype)
    if kind in ("nvfp4w2", "int4w2", "mxfp4w2", "int4b2"):
        from ..ops.pallas import qmm as qmm_mod

        p = arrays["packed"]
        if kind == "int4b2":
            # [.., K/bsz, O/8, bsz] block-major -> [.., O/8, K]
            nd = p.ndim
            perm = tuple(range(nd - 3)) + (nd - 2, nd - 3, nd - 1)
            p = p.transpose(perm)
            p = p.reshape(p.shape[:-2] + (p.shape[-2] * p.shape[-1],))
        K = p.shape[-1]
        # bd2 stores scales transposed [.., K/bsz, O]; word2 row order [.., O, K/bsz]
        nblk = (arrays["scales"].shape[-2] if kind == "int4b2"
                else arrays["scales"].shape[-1])
        bsz = K // nblk
        if kind != "int4b2":  # bd2 has no K permutation
            wb = 16 if kind == "nvfp4w2" else bsz
            tk = qmm_mod._word_tile_k(K, wb)
            p = qmm_mod.unpermute_k(p, -1, tk, bsz=wb)
        O8 = p.shape[-2]
        O = O8 * 8
        to = qmm_mod._word2_tile_o(O)
        lead = p.shape[:-2]
        pt = p.reshape(lead + (O // to, to // 8, K))
        rows = []
        for g in range(4):
            gv = (pt >> (4 * g)) & 0x000F000F
            h0 = gv & 0xF           # low 16-bit half -> one decoded row
            h1 = (gv >> 16) & 0xF   # high half -> its pair
            if qmm_mod._bitcast_order() == "interleaved":
                grp = jnp.stack([h0, h1], axis=-2).reshape(
                    lead + (O // to, to // 4, K))
            else:
                grp = jnp.concatenate([h0, h1], axis=-2)
            rows.append(grp)
        codes = jnp.concatenate(rows, axis=-2).reshape(lead + (O, K))
        if kind in ("int4w2", "int4b2"):
            vals = codes.astype(jnp.float32) - 8.0  # pack stored u = c^8 = v+8
        else:
            m = codes & 7
            codes = (codes & 8) | (m ^ (m < 2).astype(codes.dtype))  # unswap
            vals = numerics.codes_to_fp4(codes)
        sc = arrays["scales"].astype(jnp.float32)
        if kind == "int4b2":  # scales stored transposed [.., K/bsz, O]
            sc = jnp.swapaxes(sc, -1, -2)
        gs = arrays.get("global_scale")
        if gs is not None:
            sc = sc * (gs[..., None, None] if gs.ndim else gs)
        w = vals * numerics.expand_block_scale(sc, vals.shape, ((-1, bsz),))
        return w.astype(out_dtype)
    if kind in ("nvfp4w", "int4w", "mxfp4w"):
        from ..ops.pallas import qmm as qmm_mod

        p = arrays["packed"]
        K = p.shape[-1]
        bsz = K // arrays["scales"].shape[-1]
        tk = qmm_mod._word_tile_k(K, 16 if kind == "nvfp4w" else bsz)
        p = qmm_mod.unpermute_k(p, -1, tk, bsz=16 if kind == "nvfp4w" else bsz)
        if kind in ("nvfp4w", "mxfp4w"):
            even = numerics.codes_to_fp4(p & 0xF)   # [O/2, K]
            odd = numerics.codes_to_fp4((p >> 4) & 0xF)
        else:
            p32 = p.astype(jnp.int32)  # widen BEFORE xor-sub (uint8 wraps)
            even = (((p32 & 0xF) ^ 8) - 8).astype(jnp.float32)
            odd = ((((p32 >> 4) & 0xF) ^ 8) - 8).astype(jnp.float32)
        lead, O2 = p.shape[:-2], p.shape[-2]
        if qmm_mod._bitcast_order() == "interleaved":
            w = jnp.stack([even, odd], axis=-2).reshape(lead + (2 * O2, K))
        else:
            to = qmm_mod._word_tile_o(2 * O2)
            et = even.reshape(lead + (O2 // (to // 2), to // 2, K))
            ot = odd.reshape(lead + (O2 // (to // 2), to // 2, K))
            w = jnp.concatenate([et, ot], axis=-2).reshape(lead + (2 * O2, K))
        gs = arrays.get("global_scale")
        sc = arrays["scales"].astype(jnp.float32)
        if gs is not None:
            sc = sc * (gs[..., None, None] if gs.ndim else gs)
        w = w * numerics.expand_block_scale(sc, w.shape, ((-1, bsz),))
        return w.astype(out_dtype)
    raise ValueError(f"unknown kind {kind!r}")


@dataclasses.dataclass
class CompressedModel:
    """Packed-weight model: params with projections replaced by packed dicts.

    `kinds` maps site name -> format kind (static, drives kernel dispatch).
    """

    model_cfg: llama.LlamaConfig
    params: dict  # layers[name] -> packed arrays dict; others as-is
    kinds: dict[str, str]
    layout: llama.QuantLayout
    qstate: llama.QuantState  # act/KV quantizer state still applies
    # SVDQuant low-rank branch (stays high-precision at serving)
    adapters: "dict | None" = None

    @property
    def packed_bytes(self) -> int:
        total = 0
        for name in llama.PROJ_NAMES:
            for a in jax.tree.leaves(self.params["layers"][name]):
                total += a.size * a.dtype.itemsize
        return total


def compress_bf16(cfg, params) -> CompressedModel:
    """Wrap RAW (unquantized) params as a bf16-kind CompressedModel so the
    serving engine can run dense models — used by the RULER attention-
    sparsity calibration (`sparsity/ruler.py`) and dense baselines."""
    new_layers = dict(params["layers"])
    kinds = {}
    for name in llama.PROJ_NAMES:
        if name in new_layers and not isinstance(new_layers[name], dict):
            new_layers[name] = {"w": new_layers[name]}
            kinds[name] = "bf16"
    p = dict(params)
    p["layers"] = new_layers
    return CompressedModel(cfg, p, kinds, llama.QuantLayout(sites=()), {})


def compress(model: QuantizedModel) -> CompressedModel:
    """Pack every projection weight per its calibrated quantizer.

    Covers the llama projections plus MoE-family expert stacks
    ("moe.gate/up/down_proj", stacked [L, E, O, K]) and Llama4's shared
    expert — whatever weight sites the model's layout declares and its
    params carry. Routers/norms/biases/sinks pass through unpacked."""
    new_layers = dict(model.params["layers"])
    kinds = {}
    names = [n for n in llama.PROJ_NAMES if n in model.params["layers"]]
    names += [n for n in model.params["layers"]
              if n.split(".")[0] in ("moe", "shared")
              and n.endswith(("gate_proj", "up_proj", "down_proj"))]
    for name in names:
        wcfg = model.layout.get(f"{name}.weight")
        st = model.qstate.get(name, {}).get("weight")
        w = model.params["layers"][name]
        kind, arrays = compress_weight(w, wcfg, st)
        kinds[name] = kind
        new_layers[name] = arrays
    params = dict(model.params)
    if model.adapters:
        # SVDQuant low-rank factors ride the layer scan as stacked [L, ...]
        # leaves (jit args, not captured constants) under a reserved key.
        new_layers["__adapters__"] = model.adapters
    params["layers"] = new_layers
    return CompressedModel(
        model.model_cfg, params, kinds, model.layout, model.qstate,
        adapters=model.adapters,
    )
