"""SparseGPT: Hessian-aware N:M sparsification with weight reconstruction.

Re-creates `modelopt/torch/sparsity/weight_sparsity/sparsegpt.py:46-144`:
using H = X X^T + λI from calibration activations, process the weight in
column blocks; within each block choose the N:M mask by the OBS saliency
w^2 / diag(H^-1)^2, zero the pruned weights, and propagate the reconstruction
update w -= err / d * Hinv_row to the remaining columns.

TPU-first: the per-block loop is a `lax.fori_loop`; all out-rows process in
parallel (vectorized over O) and layers batch via vmap. The Cholesky of H
runs once per linear on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def hessian_from_acts(x: jax.Array, damp_frac: float = 0.01) -> jax.Array:
    """H = X^T X (+ mean-diag damping). x: [n_tokens, K] -> [K, K]."""
    x32 = x.astype(jnp.float32)
    H = x32.T @ x32
    damp = damp_frac * jnp.mean(jnp.diag(H))
    return H + damp * jnp.eye(H.shape[0], dtype=jnp.float32)


def sparsegpt_prune(
    w: jax.Array,  # [O, K]
    H: jax.Array,  # [K, K]
    n: int = 2,
    m: int = 4,
    block: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """Returns (pruned+reconstructed weight, keep mask)."""
    O, K = w.shape
    block = min(block, K)
    if K % block:
        block = m  # fall back to group-size blocks
    Hinv_chol = jnp.linalg.cholesky(jnp.linalg.inv(H))
    # upper-triangular factor as in the paper: use inverse-Cholesky rows
    Hinv = Hinv_chol.T  # [K, K], rows index columns of W
    d = jnp.diag(Hinv)  # [K]

    w32 = w.astype(jnp.float32)
    nblocks = K // block

    def body(bi, carry):
        W, M = carry
        start = bi * block
        Wb = jax.lax.dynamic_slice(W, (0, start), (O, block))
        db = jax.lax.dynamic_slice(d, (start,), (block,))
        # OBS saliency within the block, N:M mask per m-group
        sal = (Wb / db[None, :]) ** 2
        g = sal.reshape(O, block // m, m)
        order = jnp.argsort(-g, axis=-1)
        ranks = jnp.argsort(order, axis=-1)
        mask_b = (ranks < n).reshape(O, block)
        # column-by-column error propagation inside the block
        def col(ci, st):
            Wb, acc_err = st
            wcol = Wb[:, ci]
            keep = mask_b[:, ci]
            q = jnp.where(keep, wcol, 0.0)
            err = (wcol - q) / db[ci]
            # propagate to the remaining columns of this block
            row = jax.lax.dynamic_slice(Hinv, (start + ci, start), (1, block))[0]
            upd = err[:, None] * row[None, :]
            colmask = (jnp.arange(block) > ci)[None, :]
            Wb = Wb - upd * colmask
            Wb = Wb.at[:, ci].set(q)
            return Wb, acc_err + err[:, None] * jax.lax.dynamic_slice(
                Hinv, (start + ci, 0), (1, K)
            )
        Wb, block_err = jax.lax.fori_loop(
            0, block, col, (Wb, jnp.zeros((O, K), jnp.float32))
        )
        W = jax.lax.dynamic_update_slice(W, Wb, (0, start))
        # propagate accumulated error to all later blocks
        later = (jnp.arange(K) >= start + block)[None, :]
        W = W - block_err * later
        M = jax.lax.dynamic_update_slice(M, mask_b, (0, start))
        return W, M

    W, M = jax.lax.fori_loop(
        0, nblocks, body, (w32, jnp.zeros((O, K), bool))
    )
    return W.astype(w.dtype), M
