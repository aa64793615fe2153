"""Attention sparsity: flash skip-softmax (`sparsity/attention_sparsity/`).

Re-creates the reference's skip-softmax method (`methods/flash_skip_softmax
.py`): split scores into [Tq x Tk] blocks; a block whose max score is more
than `log(threshold)` below the row's running max contributes less than
`threshold` relative probability mass and is skipped. Calibration finds the
largest threshold meeting a target block-sparsity on sample data
(`calibration/calibrate.py` RULER-style sweep, data source agnostic here).

The jnp implementation computes the skip MASK exactly (for calibration,
accuracy evaluation, and tests); the Pallas serving kernel that turns the
mask into real FLOP savings is the round-2 hot path.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def block_skip_mask(
    scores: jax.Array,  # [B, n, Tq, Tk] pre-softmax (scaled, masked)
    threshold: float,
    block_q: int = 16,
    block_k: int = 16,
) -> jax.Array:
    """Boolean keep-mask over [Bq, Bk] blocks, expanded to score shape."""
    B, n, Tq, Tk = scores.shape
    bq, bk = min(block_q, Tq), min(block_k, Tk)
    nq, nk = Tq // bq, Tk // bk
    s = scores.reshape(B, n, nq, bq, nk, bk)
    blk_max = jnp.max(s, axis=(3, 5))  # [B, n, nq, nk]
    row_max = jnp.max(blk_max, axis=-1, keepdims=True)
    keep = blk_max >= row_max + math.log(max(threshold, 1e-30))
    keep_full = jnp.broadcast_to(
        keep[:, :, :, None, :, None], (B, n, nq, bq, nk, bk)
    ).reshape(B, n, Tq, Tk)
    return keep_full


def skip_softmax_attention(
    q: jax.Array,  # [B, T, n, d]
    k: jax.Array,
    v: jax.Array,
    threshold: float = 1e-3,
    causal: bool = True,
    block_q: int = 16,
    block_k: int = 16,
):
    """Attention with block-skipped softmax. Returns (out, block_sparsity)."""
    d = q.shape[-1]
    s = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    s = s / math.sqrt(d)
    T = q.shape[1]
    if causal:
        cm = jnp.where(jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -jnp.inf)
        s = s + cm[None, None]
    keep = block_skip_mask(s, threshold, block_q, block_k)
    s_kept = jnp.where(keep, s, -jnp.inf)
    p = jax.nn.softmax(s_kept, axis=-1)
    p = jnp.where(jnp.isfinite(s_kept), p, 0.0)
    out = jnp.einsum("bnqk,bknd->bqnd", p.astype(v.dtype), v)
    # sparsity over VALID (unmasked) blocks only
    valid = jnp.isfinite(s)
    sparsity = 1.0 - jnp.sum(keep & valid) / jnp.maximum(jnp.sum(valid), 1)
    return out, sparsity


def calibrate_threshold(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    target_sparsity: float = 0.5,
    causal: bool = True,
    n_steps: int = 12,
) -> float:
    """Largest threshold whose achieved sparsity <= target (binary search in
    log space — the reference's calibration sweep)."""
    lo, hi = -12.0, 0.0  # log10 threshold
    best = lo
    for _ in range(n_steps):
        mid = (lo + hi) / 2
        _, sp = skip_softmax_attention(q, k, v, 10.0 ** mid, causal)
        if float(sp) <= target_sparsity:
            best, lo = mid, mid
        else:
            hi = mid
    return 10.0 ** best


# --------------------------------------------------------------------------
# VSA: Video Sparse Attention (two-branch, `methods/vsa.py`)
# --------------------------------------------------------------------------


def tile_3d_indices(video_shape: tuple, block_3d: tuple) -> jax.Array:
    """Token permutation grouping 3D (T, H, W) tiles contiguously
    (`vsa_utils.get_tile_partition_indices`): token (t, h, w) -> its tile's
    flat slot. Returns the gather index [S]."""
    T, H, W = video_shape
    bt, bh, bw = block_3d
    idx = jnp.arange(T * H * W).reshape(T, H, W)
    tiles = idx.reshape(T // bt, bt, H // bh, bh, W // bw, bw)
    tiles = tiles.transpose(0, 2, 4, 1, 3, 5)  # tile-major
    return tiles.reshape(-1)


def vsa_attention(
    q: jax.Array,  # [B, S, n, d] (tokens already tile-ordered; use
    k: jax.Array,  # tile_3d_indices to permute video tokens first)
    v: jax.Array,
    block_size: int = 64,
    top_k_ratio: float = 0.5,
    gate_compress: float | jax.Array = 0.5,
):
    """Two-branch VSA (`methods/vsa.py:46`):

    compression branch — queries attend to block-mean-pooled K/V (coarse);
    sparse branch — per query block, only the top-K kv blocks (ranked by the
    coarse block scores) get exact attention.
    output = out_compression * gate_compress + out_sparse.

    Returns (out [B, S, n, d], block_keep [B, n, nB, nB] bool).
    """
    B, S, n, d = q.shape
    bs = min(block_size, S)
    while S % bs:
        bs //= 2
    nB = S // bs
    scale = 1.0 / math.sqrt(d)
    q32 = q.astype(jnp.float32)

    # --- compression branch: mean-pool kv per block ---
    k_c = k.astype(jnp.float32).reshape(B, nB, bs, n, d).mean(axis=2)  # [B,nB,n,d]
    v_c = v.astype(jnp.float32).reshape(B, nB, bs, n, d).mean(axis=2)
    s_c = jnp.einsum("bqnd,bknd->bnqk", q32, k_c) * scale  # [B,n,S,nB]
    p_c = jax.nn.softmax(s_c, axis=-1)
    out_comp = jnp.einsum("bnqk,bknd->bqnd", p_c, v_c)

    # --- block importance: coarse scores pooled over each query block ---
    imp = s_c.reshape(B, n, nB, bs, nB).mean(axis=3)  # [B, n, nQb, nKb]
    kcount = max(int(round(top_k_ratio * nB)), 1)
    thresh = jnp.sort(imp, axis=-1)[..., nB - kcount][..., None]
    block_keep = imp >= thresh  # [B, n, nB, nB]

    # --- sparse branch: exact attention on kept blocks only ---
    s_f = jnp.einsum("bqnd,bknd->bnqk", q32, k.astype(jnp.float32)) * scale
    keep_full = jnp.broadcast_to(
        block_keep[:, :, :, None, :, None], (B, n, nB, bs, nB, bs)
    ).reshape(B, n, S, S)
    s_f = jnp.where(keep_full, s_f, -jnp.inf)
    p_f = jax.nn.softmax(s_f, axis=-1)
    out_sparse = jnp.einsum("bnqk,bknd->bqnd", p_f, v.astype(jnp.float32))

    g = jnp.asarray(gate_compress, jnp.float32)
    out = out_comp * g + out_sparse
    return out.astype(q.dtype), block_keep
