"""KD loss balancers (`modelopt/torch/distill/loss_balancers.py`).

Combine multiple distillation loss terms (logits KD, per-layer feature
losses, student CE) into one scalar: static weights or moving-average
normalization so differently-scaled terms contribute comparably.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class StaticLossBalancer:
    """Fixed convex weights (reference StaticLossBalancer)."""

    weights: tuple[float, ...]

    def __call__(self, losses: Sequence[jax.Array]) -> jax.Array:
        assert len(losses) == len(self.weights)
        total = 0.0
        for w, l in zip(self.weights, losses):
            total = total + w * l
        return total


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DynamicLossBalancerState:
    ema: jax.Array  # [n_terms] running loss magnitudes


def init_dynamic_balancer(n_terms: int) -> DynamicLossBalancerState:
    return DynamicLossBalancerState(ema=jnp.ones((n_terms,), jnp.float32))


def dynamic_balance(
    losses: Sequence[jax.Array],
    state: DynamicLossBalancerState,
    decay: float = 0.99,
) -> tuple[jax.Array, DynamicLossBalancerState]:
    """Normalize each term by its EMA magnitude then average — terms with
    different natural scales (CE vs feature MSE) contribute equally."""
    vec = jnp.stack([l.astype(jnp.float32) for l in losses])
    ema = decay * state.ema + (1 - decay) * jax.lax.stop_gradient(vec)
    total = jnp.mean(vec / jnp.maximum(ema, 1e-8))
    return total, DynamicLossBalancerState(ema=ema)
