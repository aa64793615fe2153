"""Weight sparsity: N:M structured magnitude pruning (2:4 and friends).

Re-creates `modelopt/torch/sparsity/weight_sparsity/magnitude.py:86-131`:
within every group of M consecutive input-dim elements, keep the N largest
magnitudes. Masks are computed in one jitted pass over stacked [L, O, K]
weights; `apply_mask` is the SparseModule forward equivalent (multiplicative,
STE-friendly since the mask is constant during training).

SparseGPT (Hessian-based reconstruction, `sparsegpt.py:46`) is in
sparsity/sparsegpt.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nm_mask(w: jax.Array, n: int = 2, m: int = 4) -> jax.Array:
    """Boolean keep-mask: within each group of `m` along the last axis, keep
    the `n` largest |w|."""
    K = w.shape[-1]
    if K % m:
        raise ValueError(f"last dim {K} not divisible by m={m}")
    g = jnp.abs(w.astype(jnp.float32)).reshape(*w.shape[:-1], K // m, m)
    # rank within group: position of each element in the sorted order
    order = jnp.argsort(-g, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    mask = ranks < n
    return mask.reshape(w.shape)


def apply_mask(w: jax.Array, mask: jax.Array) -> jax.Array:
    return (w * mask.astype(w.dtype)).astype(w.dtype)


def sparsity_ratio(mask: jax.Array) -> float:
    return float(1.0 - jnp.mean(mask.astype(jnp.float32)))
