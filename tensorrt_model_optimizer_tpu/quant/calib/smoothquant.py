"""SmoothQuant: alpha-blended per-channel scale migration (act -> weight).

Replicates `modelopt/torch/quantization/model_calib.py:1274` smoothquant():
    s_j = clamp(act_amax_j^alpha / w_amax_j^(1-alpha))
where w_amax_j is the per-input-channel weight magnitude max over all linears
sharing the input. The activation is multiplied by pre_quant_scale = 1/s and
every weight column j is multiplied by s_j. Runs as one jitted pass over the
stacked [L, ...] site group (vmapped over layers for free via broadcasting).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def smoothquant_scales(
    act_amax: jax.Array,  # [..., d_in] per-channel activation amax
    weights: Sequence[jax.Array],  # each [..., d_out, d_in]
    alpha: float = 1.0,
    eps: float = 1e-5,
) -> jax.Array:
    """Per-channel migration scale s (activation is divided by s)."""
    w_amax = None
    for w in weights:
        wa = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)  # [..., d_in]
        w_amax = wa if w_amax is None else jnp.maximum(w_amax, wa)
    a = jnp.maximum(act_amax.astype(jnp.float32), eps)
    wmx = jnp.maximum(w_amax, eps)
    s = jnp.power(a, alpha) / jnp.power(wmx, 1.0 - alpha)
    # Normalize so the scale is centered (reference clamps to avoid blowup)
    s = jnp.clip(s, 1e-4, 1e4)
    # Degenerate channels keep scale 1
    return jnp.where(act_amax <= eps, jnp.ones_like(s), s)


def apply_smoothquant(
    act_amax: jax.Array,
    weights: Sequence[jax.Array],
    alpha: float = 1.0,
) -> tuple[list[jax.Array], jax.Array]:
    """Returns (folded weights [W * s per column], pre_quant_scale = 1/s)."""
    s = smoothquant_scales(act_amax, weights, alpha)
    new_ws = [
        (w.astype(jnp.float32) * s[..., None, :]).astype(w.dtype) for w in weights
    ]
    return new_ws, (1.0 / s)
