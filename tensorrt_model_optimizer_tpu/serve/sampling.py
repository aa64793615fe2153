"""Token sampling: greedy / temperature / top-k / top-p, jit-friendly."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.0  # 0 = greedy
    top_k: int = 0  # 0 = off
    top_p: float = 1.0  # 1 = off


def sample(logits: jax.Array, key: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """logits [B, V] -> token ids [B]."""
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = logits.astype(jnp.float32) / cfg.temperature
    if cfg.top_k and cfg.top_k > 0:
        kth = jnp.sort(l, axis=-1)[:, -cfg.top_k][:, None]
        l = jnp.where(l < kth, -jnp.inf, l)
    if cfg.top_p < 1.0:
        sorted_l = jnp.sort(l, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_l, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative mass >= top_p (always keep the best)
        k_keep = jnp.sum(cum < cfg.top_p, axis=-1) + 1
        cutoff = jnp.take_along_axis(sorted_l, (k_keep - 1)[:, None], axis=-1)
        l = jnp.where(l < cutoff, -jnp.inf, l)
    return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)
