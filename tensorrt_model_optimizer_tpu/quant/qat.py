"""Quantization-aware training: STE through a jitted, sharded train step.

Reference surface (SURVEY §2.11b): QAT keeps fake-quant active during
fine-tuning with STE backward (`transformers_trainer.py:186` QATTrainer).
TPU-first: one pure train step — forward with quantizers active (the STE
custom_vjps in ops/ste.py clip gradients outside amax), cross-entropy loss,
grads, SGD/Adam update — jitted under a Mesh so DP/TP shardings apply to
both forward and backward.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import llama


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean token cross-entropy. logits [B, T, V], targets [B, T]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def qat_loss(model_cfg, layout, params, qstate, tokens):
    """Next-token loss with fake quant active (STE backward)."""
    logits, _, _ = llama.forward(
        model_cfg, params, tokens[:, :-1], layout=layout, qstate=qstate
    )
    return cross_entropy(logits, tokens[:, 1:])


def make_train_step(model_cfg, layout, lr: float = 1e-4):
    """Returns a pure SGD train step: (params, qstate, tokens) -> (params, loss).

    qstate (amax etc.) is frozen during QAT (the reference freezes calibrated
    scales by default; LSQ learnable-amax is a separate mode).
    """

    def train_step(params, qstate, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: qat_loss(model_cfg, layout, p, qstate, tokens)
        )(params)
        new_params = jax.tree.map(
            lambda p, g: (p - lr * g.astype(jnp.float32).astype(p.dtype))
            if jnp.issubdtype(p.dtype, jnp.floating)
            else p,
            params,
            grads,
        )
        return new_params, loss

    return train_step
