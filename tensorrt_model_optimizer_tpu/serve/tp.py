"""Tensor-parallel serving: shard a CompressedModel over a device mesh.

The reference delegates multi-GPU serving to TRT-LLM via rank-split
checkpoints (`export/postprocess.py:852` splits weights per TP rank at
export time).  TPU-first design: the packed model stays ONE logical
checkpoint; sharding is a layout transform + `shard_map` at engine init.

Megatron-style column/row parallel over one mesh axis (default "tp"):

 - column-parallel (q/k/v/gate/up): shard the OUTPUT dim.  Plane-packed
   4-bit weights pair rows (o, o + O/2) in one byte, so a naive slice of
   the packed array would pair rows across shard boundaries.  We repack to
   a *TP-major* plane layout: shard s's block is itself plane-packed over
   its local rows, so a plain slice along the packed O axis hands every
   device a self-contained plane-packed weight (identical kernel, local
   shapes).  Decompressed row order is preserved.
 - row-parallel (o/down): shard the INPUT dim; packed bytes slice directly
   (plane pairing is along O).  A `psum` after the matmul restores the full
   output.  Dynamic per-token activation amax for these sites is reduced
   with `pmax` across the axis so real-quant numerics are bit-identical to
   the single-device engine.
 - KV cache shards over the kv-head axis; attention is fully local
   (heads are data-parallel across the axis).
 - embed/lm_head/norms replicate (the residual stream is replicated).

`shard_compressed` returns (new_cm, TPSpecs): the re-laid-out model plus
PartitionSpec pytrees mirroring params/qstate for `shard_map` in_specs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..quant.compress import CompressedModel

_BD4_TP_WARNED = False

COL_SITES = (
    "self_attn.q_proj",
    "self_attn.k_proj",
    "self_attn.v_proj",
    "mlp.gate_proj",
    "mlp.up_proj",
    "shared.gate_proj",
    "shared.up_proj",
)
ROW_SITES = ("self_attn.o_proj", "mlp.down_proj", "shared.down_proj")


@dataclasses.dataclass
class TPSpecs:
    params: Any  # PartitionSpec pytree mirroring cm.params
    qstate: Any  # PartitionSpec pytree mirroring cm.qstate
    axis: str
    n_shards: int


def _plane_to_tp_major(packed: jax.Array, d: int) -> jax.Array:
    """[L, O/2, K] global plane-packed -> TP-major plane-packed.

    Unpack to row-ordered codes, regroup so each of the d shards plane-packs
    its own contiguous O/d rows. Slicing axis 1 into d parts then yields
    valid per-shard plane layouts.
    """
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    codes = jnp.concatenate([lo, hi], axis=-2)  # [L, O, K] original row order
    L, O, K = codes.shape
    Os = O // d
    c = codes.reshape(L, d, Os, K)
    out = (c[:, :, Os // 2 :, :] << 4) | (c[:, :, : Os // 2, :] & 0xF)
    return out.astype(jnp.uint8).reshape(L, O // 2, K)


def _scales_to_tp_major(slo: jax.Array, shi: jax.Array, d: int):
    """Per-plane scale arrays [L, O/2, ...] -> TP-major halves."""
    s = jnp.concatenate(
        [slo.astype(jnp.float32), shi.astype(jnp.float32)], axis=1
    )  # [L, O, ...] original row order
    L, O = s.shape[:2]
    rest = s.shape[2:]
    Os = O // d
    s = s.reshape(L, d, Os, *rest)
    new_lo = s[:, :, : Os // 2].reshape(L, O // 2, *rest).astype(slo.dtype)
    new_hi = s[:, :, Os // 2 :].reshape(L, O // 2, *rest).astype(shi.dtype)
    return new_lo, new_hi


def _relayout_site(kind: str, arrays: dict, col: bool, d: int, axis: str):
    """Re-layout one packed site for TP; returns (arrays, spec dict)."""
    arrays = dict(arrays)
    specs: dict[str, P] = {}
    shard_O = P(None, axis, None)
    shard_K = P(None, None, axis)

    if kind == "bf16":
        specs["w"] = shard_O if col else shard_K
    elif kind == "int8":
        specs["q"] = shard_O if col else shard_K
        specs["scale"] = P(None, axis, None) if col else P()
    elif kind == "fp8":
        specs["q"] = shard_O if col else shard_K
        specs["scale"] = P()  # per-tensor [L]
    elif kind in ("int4", "nvfp4"):
        if col:
            arrays["packed"] = _plane_to_tp_major(arrays["packed"], d)
            arrays["scale_lo"], arrays["scale_hi"] = _scales_to_tp_major(
                arrays["scale_lo"], arrays["scale_hi"], d
            )
            specs["packed"] = shard_O
            specs["scale_lo"] = shard_O
            specs["scale_hi"] = shard_O
        else:
            specs["packed"] = shard_K
            # Block-scale sharding along K needs block boundaries aligned to
            # shard boundaries. A single block (per-channel amax folded to
            # one K block) replicates instead — each shard's kernel then
            # infers a local block size of K_local with the same scale.
            nblk = arrays["scale_lo"].shape[-1]
            if nblk % d == 0:
                specs["scale_lo"] = shard_K
                specs["scale_hi"] = shard_K
            elif nblk == 1:
                specs["scale_lo"] = P()
                specs["scale_hi"] = P()
            else:
                raise ValueError(
                    f"K block count {nblk} not divisible by tp={d}"
                )
        if kind == "nvfp4":
            specs["global_scale"] = P()  # [L]
    elif kind == "int4x":
        # XLA-native s4 bytes [L, O, K/2] + merged [L, O, G] scales: bytes
        # pack k-adjacent pairs, so a plain slice along either axis is
        # self-contained (no TP-major pack). K-sharding slices the byte
        # axis — shard boundaries land on bytes since block sizes are even.
        specs["qpacked"] = shard_O if col else shard_K
        if col:
            specs["scale"] = P(None, axis, None)
        else:
            nblk = arrays["scale"].shape[-1]
            K = arrays["qpacked"].shape[-1] * 2
            bsz = K // nblk
            k_local = K // d
            if k_local % bsz != 0:
                # shard narrower than a scale block: re-block scales to the
                # shard width (repeat columns) so each chunk is self-
                # contained — the int4x analog of _word_pack_sharded's
                # local re-blocking. Real models (G=32/112 at 8B) shard
                # without this; it only triggers on tiny test shapes.
                if bsz % k_local != 0:
                    raise ValueError(
                        f"K block size {bsz} incompatible with tp={d} "
                        f"(local K {k_local})")
                arrays["scale"] = jnp.repeat(
                    arrays["scale"], bsz // k_local, axis=-1)
            specs["scale"] = shard_K
    elif kind == "mxfp4":
        # same plane machinery as int4/nvfp4; E8M0 exponents are the
        # per-plane "scales" (int8 round-trips the f32 cast losslessly)
        if col:
            arrays["packed"] = _plane_to_tp_major(arrays["packed"], d)
            arrays["exp_lo"], arrays["exp_hi"] = _scales_to_tp_major(
                arrays["exp_lo"], arrays["exp_hi"], d
            )
            specs["packed"] = shard_O
            specs["exp_lo"] = shard_O
            specs["exp_hi"] = shard_O
        else:
            specs["packed"] = shard_K
            nblk = arrays["exp_lo"].shape[-1]
            if nblk % d == 0:
                specs["exp_lo"] = shard_K
                specs["exp_hi"] = shard_K
            else:
                raise ValueError(f"K block count {nblk} not divisible by tp={d}")
    else:
        raise ValueError(f"cannot TP-shard kind {kind!r} (convert perm after sharding)")
    return arrays, specs


def _word_pack_sharded(kind: str, layout: str, arrays: dict, col: bool,
                       d: int, axis: str):
    """Plane layout (TP-major for col sites) -> fused serving layout,
    packed PER SHARD CHUNK so a plain slice along the sharded axis hands
    every device a self-contained local layout.

    Packing derives its row grouping from the local O tile and its K
    structure from the local K, so a global pack would interleave data
    across shard boundaries — each chunk packs independently:

     - col (shard O): the plane arrays are already TP-major (block s =
       rows [s*Os, (s+1)*Os)); pack each block. Output scales keep shard
       s's rows contiguous -> shard along O.
     - row (shard K): split K into d chunks, pack each with the tile the
       kernel will derive from its LOCAL K; block scales slice along the
       K-block axis (or replicate when there is a single whole-K block).

    Returns (new_kind, arrays, specs).
    """
    import functools

    from ..ops.pallas import qmm as qmm_mod
    from ..quant.compress import _map_leading

    packed = arrays["packed"]
    L = packed.shape[0]
    O2, K = packed.shape[-2:]
    bsz = None
    if kind == "mxfp4":
        # E8M0 exponents -> exact f32 powers of two; the pack's f32->bf16
        # scale cast is exact for powers of two in the normal range
        slo = jnp.ldexp(jnp.float32(1.0), arrays["exp_lo"].astype(jnp.int32))
        shi = jnp.ldexp(jnp.float32(1.0), arrays["exp_hi"].astype(jnp.int32))
        bsz = K // slo.shape[-1]
        base = (qmm_mod.nvfp4_word2_pack if layout in ("word2", "bd4")
                else qmm_mod.nvfp4_word_pack)
        pack = functools.partial(base, block_size=bsz)
        new_kind = "mxfp4w2" if layout in ("word2", "bd4") else "mxfp4w"
    elif kind == "nvfp4":
        slo, shi = arrays["scale_lo"], arrays["scale_hi"]
        # bd4 falls back to word2 under TP for now: its block-major
        # [K/64, 8, O] arrays need their own shard-spec plumbing; the
        # single-device engine path serves bd4 natively.
        if layout in ("bd4", "i8"):
            global _BD4_TP_WARNED
            if not _BD4_TP_WARNED:
                _BD4_TP_WARNED = True
                import logging

                logging.getLogger(__name__).warning(
                    "nvfp4_layout=%r is not supported under tensor "
                    "parallelism; serving with the word2 pack/kernel "
                    "(kind nvfp4w2) — benchmark numbers from this config "
                    "measure word2, not %s", layout, layout)
        pack = (qmm_mod.nvfp4_word2_pack
                if layout in ("word2", "bd2", "bd4", "i8")
                else qmm_mod.nvfp4_word_pack)
        new_kind = ("nvfp4w2" if layout in ("word2", "bd2", "bd4", "i8")
                    else "nvfp4w")
    else:  # int4
        slo, shi = arrays["scale_lo"], arrays["scale_hi"]
        bsz = K // slo.shape[-1]
        nblk_t = slo.shape[-1]
        local_O = (2 * O2) // d if col else 2 * O2
        blockmajor_ok = (layout in ("bd2", "a8")
                         and qmm_mod.bd2_supported(local_O, bsz)
                         and (col or nblk_t % d == 0))
        if blockmajor_ok and layout == "a8":
            pack, new_kind = qmm_mod.int4_w48_pack, "int4w48"
        elif blockmajor_ok:
            pack, new_kind = qmm_mod.int4_bd2_pack, "int4b2"
        elif layout in ("word2", "bd2", "a8"):
            pack, new_kind = qmm_mod.int4_word2_pack, "int4w2"
        else:
            pack, new_kind = qmm_mod.int4_word_pack, "int4w"
    # int4w48 shares bd2's block-major array structure: same reshapes/specs
    bd2 = new_kind in ("int4b2", "int4w48")
    nblk = slo.shape[-1]
    out = {}
    specs: dict[str, P] = {}
    if col:
        Os2 = O2 // d  # local O/2 per shard
        p = packed.reshape(L * d, Os2, K)
        sl = slo.reshape(L * d, Os2, nblk)
        sh = shi.reshape(L * d, Os2, nblk)
        pw, sw = _map_leading(pack, p, sl, sh)
        if bd2:
            # chunk outputs [L*d, K/bsz, Os/8, bsz] -> concat along O/8
            out["packed"] = (
                pw.reshape(L, d, *pw.shape[1:])
                .transpose(0, 2, 1, 3, 4)
                .reshape(L, pw.shape[1], d * pw.shape[2], pw.shape[3])
            )
            out["scales"] = (
                sw.reshape(L, d, *sw.shape[1:])
                .transpose(0, 2, 1, 3)
                .reshape(L, sw.shape[1], d * sw.shape[2])
            )
            specs["packed"] = P(None, None, axis, None)
            specs["scales"] = P(None, None, axis)
        else:
            out["packed"] = pw.reshape(L, d * pw.shape[1], K)
            out["scales"] = sw.reshape(L, 2 * O2, sw.shape[-1])
            specs["packed"] = P(None, axis, None)
            specs["scales"] = P(None, axis, None)
    else:
        Kl = K // d
        p = packed.reshape(L, O2, d, Kl).transpose(0, 2, 1, 3).reshape(L * d, O2, Kl)
        if nblk % d == 0:
            nbl = nblk // d
            sl = slo.reshape(L, O2, d, nbl).transpose(0, 2, 1, 3).reshape(L * d, O2, nbl)
            sh = shi.reshape(L, O2, d, nbl).transpose(0, 2, 1, 3).reshape(L * d, O2, nbl)
            scale_spec = P(None, None, axis)
        elif nblk == 1:
            # one whole-K block (per-channel amax): every chunk reuses the
            # same scale; each shard's kernel infers a local K-sized block
            sl = jnp.broadcast_to(slo[:, None], (L, d, O2, 1)).reshape(L * d, O2, 1)
            sh = jnp.broadcast_to(shi[:, None], (L, d, O2, 1)).reshape(L * d, O2, 1)
            scale_spec = P()
        else:
            raise ValueError(f"K block count {nblk} not divisible by tp={d}")
        pw, sw = _map_leading(pack, p, sl, sh)
        if bd2:
            # chunk outputs [L*d, Kl/bsz, O/8, bsz]: d-major block order IS
            # global block order (blocks never cross chunk boundaries)
            out["packed"] = pw.reshape(L, d * pw.shape[1], *pw.shape[2:])
            out["scales"] = sw.reshape(L, d * sw.shape[1], sw.shape[2])
            specs["packed"] = P(None, axis, None, None)
            specs["scales"] = P(None, axis, None)
        else:
            R = pw.shape[1]  # packed row count: O/2 (word) or O/8 (word2)
            out["packed"] = (
                pw.reshape(L, d, R, Kl).transpose(0, 2, 1, 3).reshape(L, R, K)
            )
            sw = sw.reshape(L, d, 2 * O2, -1)
            if nblk == 1:
                out["scales"] = sw[:, 0]  # chunks identical -> replicate
            else:
                out["scales"] = sw.transpose(0, 2, 1, 3).reshape(L, 2 * O2, nblk)
            specs["packed"] = P(None, None, axis)
            specs["scales"] = scale_spec
    if kind == "nvfp4":
        out["global_scale"] = arrays["global_scale"]
        specs["global_scale"] = P()
    return new_kind, out, specs


def _perm_after_shard(kind: str, arrays: dict, col: bool, d: int):
    """Apply the K-permuted nvfp4 serving layout per LOCAL K chunk.

    Column sites see the full K so a global permute matches the kernel's
    view. Row sites see K/d per device: permute each chunk independently
    with the tile computed from the local K (what the kernel derives from
    its local operand shape).
    """
    from ..ops.pallas import qmm as qmm_mod

    arrays = dict(arrays)
    packed = arrays["packed"]
    K = packed.shape[-1]
    if col:
        tk = qmm_mod.nvfp4_perm_tile(K)
        arrays["packed"] = qmm_mod.permute_k(packed, -1, tk)
    else:
        Kl = K // d
        tk = qmm_mod.nvfp4_perm_tile(Kl)
        chunks = packed.reshape(*packed.shape[:-1], d, Kl)
        chunks = qmm_mod.permute_k(chunks, -1, tk)
        arrays["packed"] = chunks.reshape(*packed.shape)
    arrays["scale_lo"] = arrays["scale_lo"].astype(jnp.float32).astype(jnp.bfloat16)
    arrays["scale_hi"] = arrays["scale_hi"].astype(jnp.float32).astype(jnp.bfloat16)
    return arrays


def shard_compressed(
    cm: CompressedModel,
    n_shards: int,
    axis: str = "tp",
    nvfp4_layout: str = "word",
    int4_layout: str = "word",
) -> tuple[CompressedModel, TPSpecs]:
    """Re-layout a CompressedModel for n_shards-way tensor parallelism.

    Returns the re-laid-out model (global arrays, TP-major packed layout)
    plus spec pytrees. The serving layouts match the single-device engine's
    (`EngineConfig.{nvfp4,int4}_layout`): "word" word-packs each shard
    chunk (`_word_pack_sharded`) so TP serves the same fast kernels with
    the same numerics as one device; "perm" K-permutes per local chunk;
    "blockdot" keeps the plane layout. mxfp4 always converts to word (its
    only fused kernel). Validates divisibility of heads/ffn by n_shards.
    """
    cfg = cm.model_cfg
    d = n_shards
    assert cfg.num_attention_heads % d == 0, "q heads not divisible by tp"
    assert cfg.num_key_value_heads % d == 0, "kv heads not divisible by tp"
    assert cfg.intermediate_size % d == 0, "ffn not divisible by tp"

    new_layers = dict(cm.params["layers"])
    kinds = dict(cm.kinds)
    layer_specs: dict[str, Any] = {}

    if any(n.startswith("moe.") for n in cm.kinds):
        assert cfg.num_experts % d == 0, "experts not divisible by tp"

    def _site_layout(kind: str):
        """The fused serving layout for this kind, or None for plane."""
        if kind == "int4" and int4_layout in ("word", "word2", "bd2", "xla",
                                              "a8"):
            return int4_layout
        if kind == "nvfp4" and nvfp4_layout in ("word", "word2"):
            return nvfp4_layout
        if kind == "mxfp4":  # word layouts are mxfp4's only fused kernels
            return "word2" if nvfp4_layout == "word2" else "word"
        return None

    for name, kind in cm.kinds.items():
        if name.startswith("moe."):
            # expert parallelism: stacked [L, E, ...] leaves shard the E
            # axis; each device runs its local experts on the replicated
            # activations and the combine partial psums (serve/engine
            # _moe_ffn slices dispatch/combine by axis_index). Word
            # layouts slice trivially along E — each [O/2, K] expert
            # plane is self-contained, so convert before sharding.
            arrays = dict(new_layers[name])
            lay = _site_layout(kind)
            if lay is not None:
                from ..quant.compress import word_convert_site

                kinds[name], arrays = word_convert_site(kind, arrays, lay)
            layer_specs[name] = {
                k: P(None, axis, *([None] * (v.ndim - 2)))
                for k, v in arrays.items()
            }
            new_layers[name] = arrays
            continue
        col = name in COL_SITES
        lay = _site_layout(kind)
        if lay == "xla":
            from ..quant.compress import word_convert_site

            kind, arrays0 = word_convert_site(kind, dict(new_layers[name]), "xla")
            kinds[name] = kind
            arrays, specs = _relayout_site(kind, arrays0, col, d, axis)
            lay = None
        else:
            arrays, specs = _relayout_site(kind, new_layers[name], col, d, axis)
        if lay is not None:
            kinds[name], arrays, specs = _word_pack_sharded(
                kind, lay, arrays, col, d, axis)
        elif kind == "nvfp4" and nvfp4_layout == "perm":
            arrays = _perm_after_shard(kind, arrays, col, d)
            kinds[name] = "nvfp4p"
        new_layers[name] = arrays
        layer_specs[name] = specs

    # Qwen2-style attention biases: column-sharded with their projection;
    # MoE expert biases shard the E axis, the router (+ its bias) and
    # per-head-dim norms replicate, sinks shard with the q heads
    for name in list(new_layers):
        if name in layer_specs or name == "__adapters__":
            continue
        arr = new_layers[name]
        if name == "moe.router" or name == "moe.router__bias":
            layer_specs[name] = P()
        elif name.startswith("moe.") and name.endswith("__bias"):
            layer_specs[name] = P(None, axis, *([None] * (arr.ndim - 2)))
        elif name == "self_attn.sinks":
            layer_specs[name] = P(None, axis)
        elif name.endswith("__bias"):
            bias_col = name[: -len("__bias")] in COL_SITES
            layer_specs[name] = P(None, axis) if bias_col else P()
        else:  # norms (input/post/q_norm/k_norm), anything residual-shaped
            layer_specs[name] = P()

    # SVDQuant adapters: col -> shard B rows; row -> shard A's input dim
    # (the low-rank partial sums ride the same psum as the base matmul).
    if "__adapters__" in new_layers:
        ad_specs = {}
        for site, ad in new_layers["__adapters__"].items():
            if site in COL_SITES:
                ad_specs[site] = {"A": P(), "B": P(None, axis, None), "scale": P()}
            else:
                ad_specs[site] = {"A": P(None, None, axis), "B": P(), "scale": P()}
        layer_specs["__adapters__"] = ad_specs

    param_specs = {k: P() for k in cm.params if k != "layers"}
    param_specs["layers"] = layer_specs

    # qstate: input pre_quant_scale of ROW sites spans the sharded K dim
    def _qspec(site: str, which: str, st):
        if st is None:
            return None
        pqs_spec = P()
        if which == "input" and site in ROW_SITES and st.pre_quant_scale is not None:
            nd = st.pre_quant_scale.ndim
            pqs_spec = P(*([None] * (nd - 1) + [axis]))
        return _state_spec_like(st, pqs_spec)

    qstate_specs = {
        site: (
            {which: _qspec(site, which, st) for which, st in sub.items()}
            if isinstance(sub, dict)
            else _qspec(site, "", sub)  # bmm/lm_head sites: bare QuantizerState
        )
        for site, sub in cm.qstate.items()
    }

    params = dict(cm.params)
    params["layers"] = new_layers
    new_cm = dataclasses.replace(cm, params=params, kinds=kinds)
    return new_cm, TPSpecs(param_specs, qstate_specs, axis, d)


def _state_spec_like(st, pqs_spec):
    """Spec pytree mirroring a QuantizerState dataclass instance."""
    def leaf_spec(name, v):
        if v is None:
            return None
        if name == "pre_quant_scale":
            return pqs_spec
        if isinstance(v, tuple):
            return tuple(P() for _ in v)
        return P()

    return dataclasses.replace(
        st,
        **{
            f.name: leaf_spec(f.name, getattr(st, f.name))
            for f in dataclasses.fields(st)
        },
    )


def shard_map_fn(fn, mesh, in_specs, out_specs):
    """`jax.shard_map` with replication checking off (psum of partial
    products is intentional; the checker's VMA inference rejects it)."""
    import jax as _jax

    try:
        return _jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except TypeError:  # older spelling
        return _jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )


def cache_specs(axis: str = "tp", dp: "str | None" = None,
                kvh: bool = False, scales: bool = False) -> dict:
    """Dense KV-cache spec: shard the kv-head axis [L, B, S, n_kv, hd];
    with `dp` set, the batch dim shards over the replica axis too.
    `kvh` selects the kv-head-major kernel layout [L, B, n_kv, S, C]
    (EngineConfig.kv_attention_kernel); `scales` adds the NVFP4 block-scale
    arrays, sharded like their planes."""
    if kvh:
        sp = P(None, dp, axis, None, None)
        d = {"k": sp, "v": sp, "pos": P()}
        if scales:
            d["ks"] = sp
            d["vs"] = sp
        return d
    return {
        "k": P(None, dp, None, axis, None),
        "v": P(None, dp, None, axis, None),
        "pos": P(),
    }


def paged_cache_specs(cache, axis: str = "tp", dp: "str | None" = None):
    """PagedCache spec: k/v pages shard the kv-head axis [L, P, n_kv, pg, hd].
    With `dp`, each replica owns its own page pool, block table rows and
    slots (per-replica continuous batching — block-table page ids are
    replica-local)."""
    sp = P(None, dp, axis, None, None)
    extra = {}
    if cache.k_scales is not None:  # packed-NVFP4 scale pools shard alike
        extra = {"k_scales": sp, "v_scales": sp}
    return dataclasses.replace(
        cache,
        k_pages=sp,
        v_pages=sp,
        block_table=P(dp),
        seq_lens=P(dp),
        **extra,
    )


def local_cfg(cfg, d: int):
    """Per-device model config: heads and ffn divided by the shard count.

    head_dim is pinned explicitly (it is otherwise derived from the GLOBAL
    hidden/heads ratio, which the local head count would corrupt)."""
    return dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // d,
        num_key_value_heads=cfg.num_key_value_heads // d,
        intermediate_size=cfg.intermediate_size // d,
        head_dim=cfg.hd,
    )


def device_put_sharded(cm: CompressedModel, mesh, specs: TPSpecs) -> CompressedModel:
    """Place the re-laid-out global arrays with their NamedShardings."""
    from jax.sharding import NamedSharding

    def put(x, spec):
        if x is None or spec is None:
            return x
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = jax.tree.map(
        put, cm.params, _concretize(specs.params, cm.params),
        is_leaf=lambda x: x is None,
    )
    return dataclasses.replace(cm, params=params)


def _concretize(spec_tree, value_tree):
    """Fill replicate-P() for any value leaves the spec tree lacks."""
    def merge(spec, val):
        if isinstance(val, dict):
            spec = spec if isinstance(spec, dict) else {}
            return {k: merge(spec.get(k, P()), v) for k, v in val.items()}
        if isinstance(spec, P) or spec is None:
            return spec
        return spec

    return merge(spec_tree, value_tree)
