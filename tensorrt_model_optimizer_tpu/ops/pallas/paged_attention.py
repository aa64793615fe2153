"""Pallas paged-attention decode kernel.

The serving hot path for long contexts: one query token per sequence attends
over its paged KV cache. The block table is a scalar-prefetch input, so the
BlockSpec index_map selects exactly the pages each sequence uses — the
pipeline streams only live pages from HBM (the jnp gather path materializes
the whole [B, maxP*page] view).

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


def _kernel(page, n_kv, rep, hd, bt_ref, lens_ref, q_ref, k_ref, v_ref, o_ref,
            m_ref, l_ref, acc_ref):
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
        # q: [n_kv * rep, hd]; k/v page: [n_kv, page, hd] (kv-head-major)
        q = q_ref[0].astype(jnp.float32)  # [n_kv*rep, hd]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
        for n in range(n_kv):  # static loop: 2D dots per kv head
            qn = q[n * rep : (n + 1) * rep]  # [rep, hd]
            kn = k_ref[0, n].astype(jnp.float32)  # [page, hd]
            vn = v_ref[0, n].astype(jnp.float32)
            s = jax.lax.dot_general(
                qn, kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / math.sqrt(hd)  # [rep, page]
            s = jnp.where(pos < n_valid, s, -1e30)
            rows = slice(n * rep, (n + 1) * rep)
            m_prev = m_ref[rows, :]  # [rep, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)  # [rep, 1]
            l_new = l_ref[rows, :] * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p, vn, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rep, hd]
            acc_ref[rows, :] = acc_ref[rows, :] * corr + pv
            m_ref[rows, :] = m_new
            l_ref[rows, :] = l_new

    @pl.when(i == n_pages - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def paged_attention_decode(
    q: jax.Array,  # [B, n_heads, hd] single query token per sequence
    k_pages: jax.Array,  # [n_pages, n_kv, page, hd] (kv-head-major)
    v_pages: jax.Array,
    block_table: jax.Array,  # [B, max_pages] int32 (-1 = unused)
    seq_lens: jax.Array,  # [B] int32 (length INCLUDING the current token)
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # flattened block table, seq_lens
        grid=(B, max_pages),
        in_specs=[
            pl.BlockSpec((1, n_kv * rep, hd), lambda b, i, bt, ln: (b, 0, 0)),
            pl.BlockSpec(
                (1, n_kv, page, hd),
                lambda b, i, bt, ln: (bt[b * max_pages + i], 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, n_kv, page, hd),
                lambda b, i, bt, ln: (bt[b * max_pages + i], 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, n_kv * rep, hd), lambda b, i, bt, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_kv * rep, 1), jnp.float32),
            pltpu.VMEM((n_kv * rep, 1), jnp.float32),
            pltpu.VMEM((n_kv * rep, hd), jnp.float32),
        ],
    )
    kern = functools.partial(_kernel, page, n_kv, rep, hd)

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv * rep, hd), q.dtype),
        interpret=interpret,
    )(bt, lens, q_r, k_pages, v_pages)
    return out.reshape(B, n_kv, rep, hd).reshape(B, n_heads, hd)


# --------------------------------------------------------------------------
# Chunked prefill: T query tokens attend to paged context + causal in-chunk
# --------------------------------------------------------------------------


def _prefill_kernel(page, n_kv, rep, T, hd, bt_ref, lens_ref, q_ref,
                    k_ref, v_ref, ck_ref, cv_ref, o_ref, m_ref, l_ref, acc_ref):
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

    def online_update(n, s, vn):
        """Streaming-softmax update for kv head n with scores s [rT, S]."""
        rows = slice(n * rT, (n + 1) * rT)
        m_prev = m_ref[rows, :]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[rows, :] = l_ref[rows, :] * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, vn, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[rows, :] = acc_ref[rows, :] * corr + pv
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
                kn = k_ref[0, n].astype(jnp.float32)
                vn = v_ref[0, n].astype(jnp.float32)
                s = jax.lax.dot_general(
                    qn, kn, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) / math.sqrt(hd)
                s = jnp.where(pos < n_valid, s, -1e30)
                online_update(n, s, vn)

    @pl.when(i == n_steps - 1)
    def _():
        q = q_ref[0].astype(jnp.float32)
        # causal within the chunk: query row h*T + t sees chunk cols <= t
        row_t = jax.lax.broadcasted_iota(jnp.int32, (rT, T), 0) % T
        col_t = jax.lax.broadcasted_iota(jnp.int32, (rT, T), 1)
        mask = col_t <= row_t
        for n in range(n_kv):
            qn = q[n * rT : (n + 1) * rT]
            kn = ck_ref[0, n].astype(jnp.float32)  # [T, hd]
            vn = cv_ref[0, n].astype(jnp.float32)
            s = jax.lax.dot_general(
                qn, kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) / math.sqrt(hd)
            s = jnp.where(mask, s, -1e30)
            online_update(n, s, vn)
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def paged_attention_prefill(
    q: jax.Array,  # [B, T, n_heads, hd] chunk queries (rope'd)
    k_pages: jax.Array,  # [n_pages, n_kv, page, hd] context (kv-head-major)
    v_pages: jax.Array,
    block_table: jax.Array,  # [B, max_pages]
    ctx_lens: jax.Array,  # [B] context length BEFORE this chunk
    chunk_k: jax.Array,  # [B, T, n_kv, hd] this chunk's kv (rope'd)
    chunk_v: jax.Array,
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
    n_pages_total, n_kv, page, _ = k_pages.shape
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
    ck = chunk_k.transpose(0, 2, 1, 3)  # [B, n_kv, T, hd]
    cv = chunk_v.transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, mp1),
        in_specs=[
            pl.BlockSpec((1, n_kv * rT, hd), lambda b, i, bt, ln: (b, 0, 0)),
            pl.BlockSpec((1, n_kv, page, hd),
                         lambda b, i, bt, ln: (bt[b * mp1 + i], 0, 0, 0)),
            pl.BlockSpec((1, n_kv, page, hd),
                         lambda b, i, bt, ln: (bt[b * mp1 + i], 0, 0, 0)),
            pl.BlockSpec((1, n_kv, T, hd), lambda b, i, bt, ln: (b, 0, 0, 0)),
            pl.BlockSpec((1, n_kv, T, hd), lambda b, i, bt, ln: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_kv * rT, hd), lambda b, i, bt, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_kv * rT, 1), jnp.float32),
            pltpu.VMEM((n_kv * rT, 1), jnp.float32),
            pltpu.VMEM((n_kv * rT, hd), jnp.float32),
        ],
    )
    kern = functools.partial(_prefill_kernel, page, n_kv, rep, T, hd)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv * rT, hd), q.dtype),
        interpret=interpret,
    )(bt, lens, q_r, k_pages, v_pages, ck, cv)
    return (out.reshape(B, n_kv, rep, T, hd).reshape(B, n_heads, T, hd)
            .transpose(0, 2, 1, 3))
