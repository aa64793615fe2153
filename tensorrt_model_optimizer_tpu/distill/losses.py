"""Knowledge-distillation losses (`modelopt/torch/distill/losses.py:28-199`).

 - LogitsDistillationLoss: temperature-scaled KL(teacher || student).
 - MFTLoss (minifinetuning-style correction): KL against a teacher
   distribution corrected toward the ground-truth token.
 - MGDLoss (masked generative distillation): feature-space MSE through a
   learned projector (functional: projector params passed in).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def logits_kl(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    temperature: float = 1.0,
    reduction: str = "mean",
) -> jax.Array:
    """KL(teacher || student) with temperature^2 scaling (Hinton KD)."""
    t = temperature
    sp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    tp = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    tlogp = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(tp * (tlogp - sp), axis=-1) * (t * t)
    return jnp.mean(kl) if reduction == "mean" else kl


def mft_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    targets: jax.Array,
    correction: float = 0.3,
) -> jax.Array:
    """Teacher distribution nudged toward ground truth by `correction` mass."""
    tp = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets, tp.shape[-1], dtype=jnp.float32)
    mix = (1.0 - correction) * tp + correction * onehot
    sp = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(mix * sp, axis=-1))


def mgd_loss(
    student_feat: jax.Array,
    teacher_feat: jax.Array,
    projector: Optional[jax.Array] = None,
) -> jax.Array:
    """Feature MSE, optionally through a linear projector [d_s, d_t]."""
    s = student_feat.astype(jnp.float32)
    if projector is not None:
        s = s @ projector.astype(jnp.float32)
    return jnp.mean((s - teacher_feat.astype(jnp.float32)) ** 2)
