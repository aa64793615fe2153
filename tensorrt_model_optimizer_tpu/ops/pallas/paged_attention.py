"""Pallas paged-attention kernels (decode + chunked prefill) over raw pages.

The serving hot path for long contexts: queries attend over paged KV whose
pages stay in STORED form — bf16, int8/fp8 codes (per-layer global scales
fold into q / the context outside), or packed NVFP4 (plane-packed E2M1
nibbles + E4M3 block scales in a parallel scale pool, dequantized per tile
in VMEM — same layout and decode as the dense kernel cache,
`ops/pallas/kv_attention.py`). The block table is a scalar-prefetch input,
so the BlockSpec index_map selects exactly the pages each sequence uses —
the pipeline streams only live pages from HBM (the jnp gather path
materializes the whole [B, maxP*page] view).

Reference counterpart: decode attention with in-kernel QDQ
(`/root/reference/modelopt/torch/kernels/common/attention/
decode_attention.py:47,263`).

Grid (B, maxP); for a fixed sequence b the page index i runs sequentially,
carrying a streaming-softmax state (m, l, acc) in VMEM scratch. GQA handled
by computing per-kv-head blocks of `rep` query heads at once. Pages are
kv-head-major [n_pages, n_kv, page, hd] so every dot is a statically-sliced
2D matmul (Mosaic rejects batched dots with re-positioned batch dims).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kv_attention import _nvfp4_tile_decode


def _head_scores(fmt, hd, qn, k_slab, ks_slab):
    """[rep, S] scores for one kv head from a stored-form slab [S, C]."""
    dot_t = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if fmt == "nvfp4":
        h = hd // 2
        k_lo, k_hi = _nvfp4_tile_decode(k_slab, ks_slab, hd)
        return dot_t(qn[:, :h], k_lo) + dot_t(qn[:, h:], k_hi)
    return dot_t(qn, k_slab.astype(jnp.float32))


def _head_pv(fmt, hd, p, v_slab, vs_slab):
    """[rep, hd] PV contribution from a stored-form value slab [S, C]."""
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if fmt == "nvfp4":
        v_lo, v_hi = _nvfp4_tile_decode(v_slab, vs_slab, hd)
        return jnp.concatenate([dot(p, v_lo), dot(p, v_hi)], axis=-1)
    return dot(p, v_slab.astype(jnp.float32))


def _kernel(page, n_kv, rep, hd, fmt, bt_ref, lens_ref, q_ref, k_ref, v_ref,
            ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_pages = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = lens_ref[b]
    page_start = i * page
    # positions valid in this page: [page_start, min(seq_len, page_start+page))
    n_valid = jnp.clip(seq_len - page_start, 0, page)

    @pl.when(n_valid > 0)
    def _():
        # q: [n_kv * rep, hd]; k/v page: [n_kv, page, C] (kv-head-major)
        q = q_ref[0].astype(jnp.float32)  # [n_kv*rep, hd]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
        for n in range(n_kv):  # static loop: 2D dots per kv head
            qn = q[n * rep : (n + 1) * rep]  # [rep, hd]
            s = _head_scores(fmt, hd, qn, k_ref[0, n], ks_ref[0, n])
            s = s / math.sqrt(hd)
            s = jnp.where(pos < n_valid, s, -1e30)
            rows = slice(n * rep, (n + 1) * rep)
            m_prev = m_ref[rows, :]  # [rep, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)  # [rep, 1]
            l_new = l_ref[rows, :] * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = _head_pv(fmt, hd, p, v_ref[0, n], vs_ref[0, n])
            acc_ref[rows, :] = acc_ref[rows, :] * corr + pv
            m_ref[rows, :] = m_new
            l_ref[rows, :] = l_new

    @pl.when(i == n_pages - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def paged_attention_decode(
    q: jax.Array,  # [B, n_heads, hd] single query token per sequence
    k_pages: jax.Array,  # [n_pages, n_kv, page, C] (kv-head-major)
    v_pages: jax.Array,
    block_table: jax.Array,  # [B, max_pages] int32 (-1 = unused)
    seq_lens: jax.Array,  # [B] int32 (length INCLUDING the current token)
    fmt: str = "raw",  # "raw" (bf16/int8/fp8 codes) | "nvfp4" (planes)
    k_scale_pages: jax.Array | None = None,  # [n_pages, n_kv, page, hd/16]
    v_scale_pages: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Streaming-softmax attention over paged KV. Returns [B, n_heads, hd]."""
    B, n_heads, hd = q.shape
    n_pages_total, n_kv, page, _ = k_pages.shape
    rep = n_heads // n_kv
    max_pages = block_table.shape[1]
    if interpret is None:
        from .qmm import _interpret

        interpret = _interpret()

    bt = jnp.maximum(block_table, 0).astype(jnp.int32).reshape(-1)
    lens = seq_lens.astype(jnp.int32)
    # q rearranged so kv-head-major: [B, n_kv*rep, hd]
    q_r = q.reshape(B, n_kv, rep, hd).reshape(B, n_kv * rep, hd)

    C = k_pages.shape[-1]
    page_idx = lambda b, i, bt, ln: (bt[b * max_pages + i], 0, 0, 0)
    in_specs = [
        pl.BlockSpec((1, n_kv * rep, hd), lambda b, i, bt, ln: (b, 0, 0)),
        pl.BlockSpec((1, n_kv, page, C), page_idx),
        pl.BlockSpec((1, n_kv, page, C), page_idx),
    ]
    args = [q_r, k_pages, v_pages]
    if fmt == "nvfp4":
        nb = hd // 16
        in_specs += [
            pl.BlockSpec((1, n_kv, page, nb), page_idx),
            pl.BlockSpec((1, n_kv, page, nb), page_idx),
        ]
        args += [k_scale_pages, v_scale_pages]
    else:
        dummy = jnp.zeros((1, n_kv, page, 8), jnp.uint8)
        in_specs += [
            pl.BlockSpec((1, n_kv, page, 8), lambda b, i, bt, ln: (0, 0, 0, 0)),
            pl.BlockSpec((1, n_kv, page, 8), lambda b, i, bt, ln: (0, 0, 0, 0)),
        ]
        args += [dummy, dummy]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # flattened block table, seq_lens
        grid=(B, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_kv * rep, hd), lambda b, i, bt, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_kv * rep, 1), jnp.float32),
            pltpu.VMEM((n_kv * rep, 1), jnp.float32),
            pltpu.VMEM((n_kv * rep, hd), jnp.float32),
        ],
    )
    kern = functools.partial(_kernel, page, n_kv, rep, hd, fmt)

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv * rep, hd), q.dtype),
        interpret=interpret,
    )(bt, lens, *args)
    return out.reshape(B, n_kv, rep, hd).reshape(B, n_heads, hd)


# --------------------------------------------------------------------------
# Chunked prefill: T query tokens attend to paged context + causal in-chunk
# --------------------------------------------------------------------------


def _prefill_kernel(page, n_kv, rep, T, hd, fmt, bt_ref, lens_ref, q_ref,
                    k_ref, v_ref, ks_ref, vs_ref, ck_ref, cv_ref,
                    cks_ref, cvs_ref, o_ref, m_ref, l_ref, acc_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)  # maxP + 1; last step = in-chunk block
    rT = rep * T

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ctx_len = lens_ref[b]

    def online_update(n, s, pv):
        """Streaming-softmax update for kv head n with scores s [rT, S]."""
        rows = slice(n * rT, (n + 1) * rT)
        m_prev = m_ref[rows, :]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[rows, :] = l_ref[rows, :] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[rows, :] = acc_ref[rows, :] * corr + pv(p)
        m_ref[rows, :] = m_new

    @pl.when(i < n_steps - 1)
    def _():
        page_start = i * page
        n_valid = jnp.clip(ctx_len - page_start, 0, page)

        @pl.when(n_valid > 0)
        def _():
            q = q_ref[0].astype(jnp.float32)  # [n_kv*rT, hd]
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
            for n in range(n_kv):
                qn = q[n * rT : (n + 1) * rT]
                s = _head_scores(fmt, hd, qn, k_ref[0, n], ks_ref[0, n])
                s = s / math.sqrt(hd)
                s = jnp.where(pos < n_valid, s, -1e30)
                online_update(n, s, lambda p, n=n: _head_pv(
                    fmt, hd, p, v_ref[0, n], vs_ref[0, n]))

    @pl.when(i == n_steps - 1)
    def _():
        q = q_ref[0].astype(jnp.float32)
        # causal within the chunk: query row h*T + t sees chunk cols <= t
        row_t = jax.lax.broadcasted_iota(jnp.int32, (rT, T), 0) % T
        col_t = jax.lax.broadcasted_iota(jnp.int32, (rT, T), 1)
        mask = col_t <= row_t
        for n in range(n_kv):
            qn = q[n * rT : (n + 1) * rT]
            s = _head_scores(fmt, hd, qn, ck_ref[0, n], cks_ref[0, n])
            s = s / math.sqrt(hd)
            s = jnp.where(mask, s, -1e30)
            online_update(n, s, lambda p, n=n: _head_pv(
                fmt, hd, p, cv_ref[0, n], cvs_ref[0, n]))
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def paged_attention_prefill(
    q: jax.Array,  # [B, T, n_heads, hd] chunk queries (rope'd)
    k_pages: jax.Array,  # [n_pages, n_kv, page, C] context (kv-head-major)
    v_pages: jax.Array,
    block_table: jax.Array,  # [B, max_pages]
    ctx_lens: jax.Array,  # [B] context length BEFORE this chunk
    chunk_k: jax.Array,  # [B, T, n_kv, C] this chunk's kv, STORED form
    chunk_v: jax.Array,
    fmt: str = "raw",
    k_scale_pages: jax.Array | None = None,
    v_scale_pages: jax.Array | None = None,
    chunk_k_scales: jax.Array | None = None,  # [B, T, n_kv, hd/16]
    chunk_v_scales: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Flash-style chunked prefill over paged KV. Returns [B, T, n_heads, hd].

    Every chunk query attends to the full paged context (ctx_lens masks the
    partial last page) plus causally within the chunk — the batched-prefill
    analog of the reference's paged attention (one kernel, no [B,T,S] score
    materialization). Grid (B, maxP+1); the final step folds the in-chunk
    causal block into the same streaming-softmax state.
    """
    B, T, n_heads, hd = q.shape
    n_pages_total, n_kv, page, C = k_pages.shape
    rep = n_heads // n_kv
    max_pages = block_table.shape[1]
    if interpret is None:
        from .qmm import _interpret

        interpret = _interpret()

    # pad the flattened block table with one safe column for the chunk step
    bt = jnp.maximum(block_table, 0).astype(jnp.int32)
    bt = jnp.concatenate([bt, jnp.zeros((B, 1), jnp.int32)], axis=1).reshape(-1)
    lens = ctx_lens.astype(jnp.int32)
    mp1 = max_pages + 1
    rT = rep * T
    # kv-head-major rows: head-major then time -> row n*rT + h*T + t
    q_r = (q.transpose(0, 2, 1, 3)  # [B, nH, T, hd]
           .reshape(B, n_kv, rep, T, hd).reshape(B, n_kv * rT, hd))
    ck = chunk_k.transpose(0, 2, 1, 3)  # [B, n_kv, T, C]
    cv = chunk_v.transpose(0, 2, 1, 3)

    page_idx = lambda b, i, bt, ln: (bt[b * mp1 + i], 0, 0, 0)
    chunk_idx = lambda b, i, bt, ln: (b, 0, 0, 0)
    in_specs = [
        pl.BlockSpec((1, n_kv * rT, hd), lambda b, i, bt, ln: (b, 0, 0)),
        pl.BlockSpec((1, n_kv, page, C), page_idx),
        pl.BlockSpec((1, n_kv, page, C), page_idx),
    ]
    args = [q_r, k_pages, v_pages]
    if fmt == "nvfp4":
        nb = hd // 16
        in_specs += [
            pl.BlockSpec((1, n_kv, page, nb), page_idx),
            pl.BlockSpec((1, n_kv, page, nb), page_idx),
        ]
        args += [k_scale_pages, v_scale_pages]
    else:
        dummy = jnp.zeros((1, n_kv, page, 8), jnp.uint8)
        in_specs += [
            pl.BlockSpec((1, n_kv, page, 8), lambda b, i, bt, ln: (0, 0, 0, 0)),
            pl.BlockSpec((1, n_kv, page, 8), lambda b, i, bt, ln: (0, 0, 0, 0)),
        ]
        args += [dummy, dummy]
    in_specs += [
        pl.BlockSpec((1, n_kv, T, C), chunk_idx),
        pl.BlockSpec((1, n_kv, T, C), chunk_idx),
    ]
    args += [ck, cv]
    if fmt == "nvfp4":
        nb = hd // 16
        in_specs += [
            pl.BlockSpec((1, n_kv, T, nb), chunk_idx),
            pl.BlockSpec((1, n_kv, T, nb), chunk_idx),
        ]
        args += [chunk_k_scales.transpose(0, 2, 1, 3),
                 chunk_v_scales.transpose(0, 2, 1, 3)]
    else:
        dummy_c = jnp.zeros((B, n_kv, T, 8), jnp.uint8)
        in_specs += [
            pl.BlockSpec((1, n_kv, T, 8), chunk_idx),
            pl.BlockSpec((1, n_kv, T, 8), chunk_idx),
        ]
        args += [dummy_c, dummy_c]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, mp1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_kv * rT, hd), lambda b, i, bt, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_kv * rT, 1), jnp.float32),
            pltpu.VMEM((n_kv * rT, 1), jnp.float32),
            pltpu.VMEM((n_kv * rT, hd), jnp.float32),
        ],
    )
    kern = functools.partial(_prefill_kernel, page, n_kv, rep, T, hd, fmt)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv * rT, hd), q.dtype),
        interpret=interpret,
    )(bt, lens, *args)
    return (out.reshape(B, n_kv, rep, T, hd).reshape(B, n_heads, T, hd)
            .transpose(0, 2, 1, 3))
