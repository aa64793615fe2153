"""Distillation "model": student+teacher pairing as a loss function + step.

Re-creates the reference's `DistillationModel` (`distillation_model.py:35`) and
`KDLossConfig` the functional way: instead of wrapping modules with capture
hooks, the distill loss composes the two forwards directly (teacher under
`stop_gradient`). QAD = student forward with fake-quant active (pass a quant
layout) — the `QADTrainer` composition (`transformers_trainer.py:414`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..quant import qat as qat_mod
from . import losses


@dataclasses.dataclass(frozen=True)
class KDConfig:
    temperature: float = 1.0
    kd_weight: float = 0.5  # blend: kd_weight * KD + (1-kd_weight) * CE
    loss: str = "logits_kl"  # "logits_kl" | "mft"
    mft_correction: float = 0.3


def distill_loss(
    model_cfg: llama.LlamaConfig,
    student_params: llama.Params,
    teacher_params: llama.Params,
    tokens: jax.Array,
    kd: KDConfig = KDConfig(),
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[llama.QuantState] = None,
    teacher_cfg: Optional[llama.LlamaConfig] = None,
    forward_fn=None,
    teacher_forward_fn=None,
) -> jax.Array:
    """Combined CE + KD loss for one batch (teacher is frozen).

    `forward_fn`/`teacher_forward_fn` select non-llama registry family
    forwards (returning (logits, state)) for student/teacher — e.g. QAD on
    a fused-MoE family, or distilling a mixtral teacher into a llama
    student."""
    inp, tgt = tokens[:, :-1], tokens[:, 1:]
    if forward_fn is not None:
        s_logits = forward_fn(
            model_cfg, student_params, inp, layout=layout, qstate=qstate)[0]
    else:
        s_logits, _, _ = llama.forward(
            model_cfg, student_params, inp, layout=layout, qstate=qstate
        )
    tfwd = teacher_forward_fn or forward_fn
    if tfwd is not None:
        t_logits = tfwd(teacher_cfg or model_cfg, teacher_params, inp)[0]
    else:
        t_logits, _, _ = llama.forward(teacher_cfg or model_cfg, teacher_params, inp)
    t_logits = jax.lax.stop_gradient(t_logits)
    ce = qat_mod.cross_entropy(s_logits, tgt)
    if kd.loss == "mft":
        kdl = losses.mft_loss(s_logits, t_logits, tgt, kd.mft_correction)
    else:
        kdl = losses.logits_kl(s_logits, t_logits, kd.temperature)
    return kd.kd_weight * kdl + (1.0 - kd.kd_weight) * ce


def make_distill_step(
    model_cfg: llama.LlamaConfig,
    kd: KDConfig = KDConfig(),
    lr: float = 1e-4,
    layout: Optional[llama.QuantLayout] = None,
    teacher_cfg: Optional[llama.LlamaConfig] = None,
    forward_fn=None,
    teacher_forward_fn=None,
):
    """SGD distillation step; pass `layout`+qstate for QAD."""

    def step(student_params, teacher_params, tokens, qstate=None):
        loss, grads = jax.value_and_grad(
            lambda p: distill_loss(
                model_cfg, p, teacher_params, tokens, kd, layout, qstate,
                teacher_cfg, forward_fn, teacher_forward_fn
            )
        )(student_params)
        new_params = jax.tree.map(
            lambda p, g: (p - lr * g.astype(jnp.float32).astype(p.dtype))
            if jnp.issubdtype(p.dtype, jnp.floating)
            else p,
            student_params,
            grads,
        )
        return new_params, loss

    return step


def export_student(student_params: llama.Params) -> llama.Params:
    """Strip-teacher export (`distill/mode.py:106`): params are already the
    standalone student in this functional design; provided for API parity."""
    return student_params
