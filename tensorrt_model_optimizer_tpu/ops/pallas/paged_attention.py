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
