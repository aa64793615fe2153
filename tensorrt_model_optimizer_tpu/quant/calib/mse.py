"""MSE calibration: amax grid search minimizing quantization MSE.

Replicates `modelopt/torch/quantization/calib/mse.py:31`: sweep candidate
amax = amax0 * r over a shrink grid, pick the r minimizing || x - Q(x) ||^2.
Used for weights directly (weights are the data) and for activations over a
captured sample.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def mse_amax_search(
    x: jax.Array,
    amax0: jax.Array,  # initial (max-calibrated) amax, broadcastable reduced form
    quant_with_amax: Callable[[jax.Array, jax.Array], jax.Array],
    expand: Callable[[jax.Array], jax.Array] = lambda a: a,
    n_steps: int = 16,
    start: float = 0.3,
    stop: float = 1.0,
    reduce_axes: tuple[int, ...] | None = None,
) -> jax.Array:
    """Returns the best amax (same shape as amax0).

    `expand(amax)` broadcasts a reduced amax against x (e.g. block repeat);
    `reduce_axes` are the axes of x that each amax element covers (defaults
    to all axes — per-tensor).
    """
    x32 = x.astype(jnp.float32)
    ratios = jnp.linspace(start, stop, n_steps)

    def loss_for(r):
        amax = amax0 * r
        xq = quant_with_amax(x32, expand(amax))
        err = (xq.astype(jnp.float32) - x32) ** 2
        if reduce_axes is None:
            return jnp.mean(err)
        return jnp.mean(err, axis=reduce_axes)

    losses = jax.lax.map(loss_for, ratios)  # [n_steps, ...amax-shaped]
    best = jnp.argmin(losses, axis=0)
    return amax0 * ratios[best]


def local_hessian_amax_search(
    x: jax.Array,  # [n_tok, K] calibration activations
    w: jax.Array,  # [O, K]
    amax0: jax.Array,  # [O, K/bsz] block amax (max-calibrated)
    quant_with_amax: Callable[[jax.Array, jax.Array], jax.Array],
    block_size: int,
    n_steps: int = 8,
    start: float = 0.5,
) -> jax.Array:
    """Hessian-weighted block-scale search (`local_hessian_calibrate`,
    `model_calib.py:1005`): pick each block's amax shrink ratio minimizing
    the output-space error  || X (W - Q(W))^T ||^2  — equivalently the
    (W-Q)^T H (W-Q) objective with H = X^T X — per (row, block)."""
    x32 = x.astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    O, K = w32.shape
    bsz = min(block_size, K)
    nblk = -(-K // bsz)  # ceil: non-divisible K pads with zeros (block quant
    # pads the same way; zero columns contribute nothing to the loss)
    Kp = nblk * bsz
    if Kp != K:
        x32 = jnp.pad(x32, ((0, 0), (0, Kp - K)))
        w32 = jnp.pad(w32, ((0, 0), (0, Kp - K)))
    ratios = jnp.linspace(start, 1.0, n_steps)
    # per-block output-energy loss: sum over tokens of (x_blk @ dW_blk^T)^2,
    # accumulated per block independently (blocks' errors are approximately
    # separable, like the reference's per-block search)
    xb = x32.reshape(-1, nblk, bsz)

    def loss_for(r):
        amax = amax0 * r
        full = jnp.repeat(amax, bsz, axis=-1)[:, :Kp]
        dw = (w32 - quant_with_amax(w32, full)).reshape(O, nblk, bsz)
        # err_b[o, blk] = sum_t (sum_k x[t,blk,k] dw[o,blk,k])^2
        e = jnp.einsum("tbk,obk->obt", xb, dw)
        return jnp.sum(e * e, axis=-1)  # [O, nblk]

    losses = jax.lax.map(loss_for, ratios)
    best = jnp.argmin(losses, axis=0)
    return amax0 * ratios[best]
