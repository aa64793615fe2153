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
