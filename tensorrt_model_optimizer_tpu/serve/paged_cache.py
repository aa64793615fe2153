"""Paged KV cache: page-pool storage + block tables (vLLM-style, TPU-first).

The reference delegates paged KV to TRT-LLM/vLLM; here it's native. Layout:

  pages:       [L, n_pages, n_kv, page_size, hd]  (kv-head-major: the
               Pallas decode kernel slices per-kv-head 2D tiles statically;
               quantized dtype ok)
  block_table: [max_seqs, max_pages_per_seq] int32 (page ids, -1 = unused)
  seq_lens:    [max_seqs] int32

All shapes static; allocation/free is host-side (the scheduler owns the free
list), while append/gather run jitted. Attention gathers a sequence's pages
into a contiguous view — a Pallas scalar-prefetch kernel replaces the gather
on the serving hot path (round 2); the jnp path is exact and tested.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PagedKV:
    k_pages: jax.Array  # [L, n_pages, n_kv, page, hd]
    v_pages: jax.Array
    block_table: jax.Array  # [max_seqs, max_pages]
    seq_lens: jax.Array  # [max_seqs]
    # Packed-NVFP4 page pool: k/v_pages hold PLANE-PACKED nibbles
    # [L, n_pages, n_kv, page, hd/2] u8 and these hold the E4M3 block
    # scales [L, n_pages, n_kv, page, hd/16] u8 (same plane layout as the
    # dense kernel cache, ops/pallas/kv_attention.py). None = plain pages.
    k_scales: Optional[jax.Array] = None
    v_scales: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def max_pages(self) -> int:
        return self.block_table.shape[1]

    @property
    def packed_nvfp4(self) -> bool:
        return self.k_scales is not None


jax.tree_util.register_dataclass(PagedKV)


def init_paged(
    n_layers: int,
    n_pages: int,
    page_size: int,
    n_kv: int,
    hd: int,
    max_seqs: int,
    max_pages_per_seq: int,
    dtype=jnp.bfloat16,
    packed_nvfp4: bool = False,
) -> PagedKV:
    if packed_nvfp4:
        return PagedKV(
            k_pages=jnp.zeros(
                (n_layers, n_pages, n_kv, page_size, hd // 2), jnp.uint8),
            v_pages=jnp.zeros(
                (n_layers, n_pages, n_kv, page_size, hd // 2), jnp.uint8),
            block_table=jnp.full((max_seqs, max_pages_per_seq), -1, jnp.int32),
            seq_lens=jnp.zeros((max_seqs,), jnp.int32),
            k_scales=jnp.zeros(
                (n_layers, n_pages, n_kv, page_size, hd // 16), jnp.uint8),
            v_scales=jnp.zeros(
                (n_layers, n_pages, n_kv, page_size, hd // 16), jnp.uint8),
        )
    return PagedKV(
        k_pages=jnp.zeros((n_layers, n_pages, n_kv, page_size, hd), dtype),
        v_pages=jnp.zeros((n_layers, n_pages, n_kv, page_size, hd), dtype),
        block_table=jnp.full((max_seqs, max_pages_per_seq), -1, jnp.int32),
        seq_lens=jnp.zeros((max_seqs,), jnp.int32),
    )


def append_token_kv(cache: PagedKV, k: jax.Array, v: jax.Array) -> PagedKV:
    """Write one token's k/v for every active sequence.

    k, v: [L, B, n_kv, hd] (B = max_seqs slots; inactive slots write to their
    current position harmlessly as long as their block_table page is valid —
    the scheduler keeps a scratch page mapped for idle slots).
    """
    L, B, n_kv, hd = k.shape
    page = cache.page_size
    pos = cache.seq_lens  # [B] position to write
    pidx = pos // page
    poff = pos % page
    page_ids = jnp.take_along_axis(cache.block_table, pidx[:, None], axis=1)[:, 0]
    page_ids = jnp.maximum(page_ids, 0)

    def upd(pages, x):
        # pages [L, n_pages, n_kv, page, hd]; x [L, B, n_kv, hd].
        # Non-adjacent advanced indices put the broadcast (B) dim first:
        # target slice shape is [B, L, n_kv, hd].
        return pages.at[:, page_ids, :, poff].set(
            jnp.swapaxes(x, 0, 1).astype(pages.dtype)
        )

    return PagedKV(
        k_pages=upd(cache.k_pages, k),
        v_pages=upd(cache.v_pages, v),
        block_table=cache.block_table,
        seq_lens=cache.seq_lens + 1,
    )


def gather_sequence_kv(cache: PagedKV, layer_k, layer_v, out_dtype=None):
    """Gather per-sequence contiguous K/V: [B, max_pages*page, n_kv, hd].

    layer_k/layer_v: [n_pages, n_kv, page, hd] (one layer's pages).
    Positions beyond seq_len must be masked by the caller.
    """
    bt = jnp.maximum(cache.block_table, 0)  # [B, P]
    k = layer_k[bt]  # [B, P, n_kv, page, hd]
    v = layer_v[bt]
    B, P, n_kv, pg, hd = k.shape
    k = jnp.swapaxes(k, 2, 3).reshape(B, P * pg, n_kv, hd)
    v = jnp.swapaxes(v, 2, 3).reshape(B, P * pg, n_kv, hd)
    if out_dtype is not None:
        k = k.astype(out_dtype)
        v = v.astype(out_dtype)
    return k, v
