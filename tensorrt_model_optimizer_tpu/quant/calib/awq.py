"""AWQ: activation-aware weight quantization (lite + clip).

Replicates the reference's algorithms over stacked [L, ...] site groups:

 - awq_lite (`model_calib.py:1395`): grid-search alpha in [0, 1]; per-channel
   scale s = act_scale^alpha / sqrt(max*min normalization); evaluate the true
   layer-output MSE  || X W^T - (X/s) Q(W*s)^T ||  on captured activations;
   keep the best alpha per layer. One jitted evaluation per alpha, batched
   over all layers at once (the reference loops modules in Python; here the
   layer dim is just a batch dim on the MXU).

 - awq_clip (`model_calib.py:1725`): per-block clip-ratio search shrinking the
   weight-block amax, minimizing  || X W^T - X Q_clip(W)^T ||  over a ratio
   grid.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _normalize_scale(s: jax.Array, eps: float = 1e-4) -> jax.Array:
    """AWQ's stabilization: s <- s / sqrt(s_max * s_min), clamped."""
    smax = jnp.max(s, axis=-1, keepdims=True)
    smin = jnp.min(s, axis=-1, keepdims=True)
    s = s / jnp.sqrt(jnp.maximum(smax * smin, eps))
    return jnp.clip(s, eps, 1.0 / eps)


def awq_lite_search(
    x: jax.Array,  # [..., n_tok, d_in] captured inputs (shared by the group)
    weights: Sequence[jax.Array],  # each [..., d_out, d_in]
    quant_fns: Sequence[Callable[[jax.Array], jax.Array]],  # per-weight fake quant
    act_absmean: jax.Array,  # [..., d_in] mean |x| over calibration set
    alpha_step: float = 0.1,
) -> tuple[jax.Array, jax.Array]:
    """Returns (best_alpha [...], best_scale s [..., d_in]).

    The activation is multiplied by 1/s at runtime; weights by s.
    """
    x32 = x.astype(jnp.float32)
    n_alpha = int(round(1.0 / alpha_step)) + 1
    alphas = jnp.linspace(0.0, 1.0, n_alpha)

    ref_outs = [
        jnp.einsum("...ni,...oi->...no", x32, w.astype(jnp.float32))
        for w in weights
    ]

    def loss_for_alpha(alpha):
        s = _normalize_scale(
            jnp.power(jnp.maximum(act_absmean.astype(jnp.float32), 1e-8), alpha)
        )
        loss = 0.0
        xs = x32 / s[..., None, :]
        for w, qfn, ref in zip(weights, quant_fns, ref_outs):
            wq = qfn((w.astype(jnp.float32) * s[..., None, :]).astype(w.dtype))
            out = jnp.einsum("...ni,...oi->...no", xs, wq.astype(jnp.float32))
            loss = loss + jnp.mean((out - ref) ** 2, axis=(-2, -1))
        return loss  # [...]

    losses = jax.lax.map(loss_for_alpha, alphas)  # [n_alpha, ...]
    best = jnp.argmin(losses, axis=0)  # [...]
    best_alpha = alphas[best]
    s_best = _normalize_scale(
        jnp.power(
            jnp.maximum(act_absmean.astype(jnp.float32), 1e-8),
            best_alpha[..., None],
        )
    )
    return best_alpha, s_best


def awq_clip_search(
    x: jax.Array,  # [..., n_tok, d_in]
    w: jax.Array,  # [..., d_out, d_in]
    block_size: int,
    quant_with_amax: Callable[[jax.Array, jax.Array], jax.Array],
    n_ratios: int = 8,
    max_shrink: float = 0.5,
) -> jax.Array:
    """Per-block clipped amax minimizing output MSE.

    Returns amax [..., d_out, d_in/block]. `quant_with_amax(w, amax_full)`
    fake-quantizes with an explicit (broadcastable) amax.
    """
    x32 = x.astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    bsz = min(block_size, w.shape[-1])
    nblk = w.shape[-1] // bsz
    amax0 = jnp.max(
        jnp.abs(w32).reshape(*w32.shape[:-1], nblk, bsz), axis=-1
    )  # [..., d_out, nblk]
    ratios = jnp.linspace(1.0, max_shrink, n_ratios)

    # Reference evaluates || x W^T ||-style loss per block; equivalently per
    # out-channel over block slices: out_ob = sum_b x_b @ w_ob. We evaluate
    # the full output for each ratio (blocks interact only additively).
    ref = jnp.einsum("...ni,...oi->...no", x32, w32)

    def loss_for_ratio(r):
        amax = amax0 * r
        amax_full = jnp.repeat(amax, bsz, axis=-1)
        wq = quant_with_amax(w32, amax_full)
        out = jnp.einsum("...ni,...oi->...no", x32, wq.astype(jnp.float32))
        # per-out-channel loss so each row picks its own ratio
        return jnp.mean((out - ref) ** 2, axis=-2)  # [..., d_out]

    losses = jax.lax.map(loss_for_ratio, ratios)  # [n_ratios, ..., d_out]
    best = jnp.argmin(losses, axis=0)  # [..., d_out]
    best_ratio = ratios[best]  # [..., d_out]
    return amax0 * best_ratio[..., None]
