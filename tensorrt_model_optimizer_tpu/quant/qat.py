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


def qat_loss(model_cfg, layout, params, qstate, tokens, forward_fn=None):
    """Next-token loss with fake quant active (STE backward).

    `forward_fn` selects a non-llama registry family's forward (returns
    (logits, state)); default is the llama forward."""
    if forward_fn is not None:
        logits = forward_fn(
            model_cfg, params, tokens[:, :-1], layout=layout, qstate=qstate
        )[0]
    else:
        logits, _, _ = llama.forward(
            model_cfg, params, tokens[:, :-1], layout=layout, qstate=qstate
        )
    return cross_entropy(logits, tokens[:, 1:])


def make_train_step(model_cfg, layout, lr: float = 1e-4, forward_fn=None):
    """Returns a pure SGD train step: (params, qstate, tokens) -> (params, loss).

    qstate (amax etc.) is frozen during QAT (the reference freezes calibrated
    scales by default; LSQ learnable-amax is a separate mode).
    """

    def train_step(params, qstate, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: qat_loss(model_cfg, layout, p, qstate, tokens, forward_fn)
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


def make_optax_train_step(
    model_cfg,
    layout,
    optimizer=None,
    train_amax: bool = False,
    masks: Optional[dict] = None,
    forward_fn=None,
):
    """Full QAT trainer step (the QATTrainer analog): optax optimizer,
    optional LSQ amax training (sites with `learn_amax=True` receive amax
    gradients), optional sparsity-mask re-projection after each update.

    Returns (step_fn, init_fn): init_fn(params, qstate) -> opt_state;
    step_fn(params, qstate, opt_state, tokens) -> (params, qstate, opt_state,
    loss).
    """
    import optax

    optimizer = optimizer or optax.adam(1e-4)

    def loss_fn(params, qstate, tokens):
        return qat_loss(model_cfg, layout, params, qstate, tokens, forward_fn)

    def init_fn(params, qstate):
        trainables = (params, qstate) if train_amax else params
        return optimizer.init(trainables)

    def step_fn(params, qstate, opt_state, tokens):
        if train_amax:
            loss, grads = jax.value_and_grad(
                lambda pq: loss_fn(pq[0], pq[1], tokens)
            )((params, qstate))
            updates, opt_state = optimizer.update(grads, opt_state, (params, qstate))
            params, qstate = optax.apply_updates((params, qstate), updates)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, qstate, tokens)
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        if masks is not None:
            from ..sparsity import sparsify as sp

            params = sp.reapply(params, masks)
        return params, qstate, opt_state, loss

    return step_fn, init_fn
