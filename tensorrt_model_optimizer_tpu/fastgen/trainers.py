"""FastGen: diffusion acceleration trainers (few-step distillation).

Re-creates the reference's experimental fastgen surface
(`modelopt/torch/fastgen`: dmd.py, flow matching, EMA): training loops that
turn a multi-step diffusion model (our DiT) into a few-step one.

 - `make_flow_matching_step`: rectified-flow training of the base model
   (velocity prediction v = x1 - x0 on straight paths).
 - `ddim_sample`: deterministic multi-step sampler (the teacher's ODE).
 - `make_distill_fewstep_step`: progressive-distillation-style objective —
   the student matches the teacher's k-step trajectory jump in one step
   (the core of DMD-style acceleration, minus the adversarial critic).
 - `ema_update`: exponential-moving-average weights (the reference's EMA
   module), used as the distillation target.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models import dit


def make_flow_matching_step(cfg: dit.DiTConfig, lr: float = 1e-4):
    """Rectified flow: model(x_t, t) predicts v = x1 - x0, x_t = (1-t)x0 + t x1."""

    def loss_fn(params, x0, key):
        B = x0.shape[0]
        k1, k2 = jax.random.split(key)
        x1 = jax.random.normal(k1, x0.shape, jnp.float32).astype(x0.dtype)
        t = jax.random.uniform(k2, (B,), jnp.float32)
        xt = ((1 - t)[:, None, None, None] * x0 + t[:, None, None, None] * x1).astype(x0.dtype)
        v_pred, _ = dit.forward(cfg, params, xt, (t * 999).astype(jnp.int32))
        v_tgt = (x1 - x0).astype(jnp.float32)
        return jnp.mean((v_pred.astype(jnp.float32) - v_tgt) ** 2)

    def step(params, x0, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, key)
        new = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
        return new, loss

    return step


def ddim_sample(cfg: dit.DiTConfig, params, x_T: jax.Array, steps: int = 8):
    """Deterministic rectified-flow sampler: x_{t-dt} = x_t - dt * v(x_t, t)."""
    dt = 1.0 / steps

    def body(i, x):
        t = 1.0 - i * dt
        tt = jnp.full((x.shape[0],), int(0) , jnp.int32) + jnp.asarray(t * 999, jnp.int32)
        v, _ = dit.forward(cfg, params, x, tt)
        return (x.astype(jnp.float32) - dt * v.astype(jnp.float32)).astype(x.dtype)

    return jax.lax.fori_loop(0, steps, body, x_T)


def make_distill_fewstep_step(
    cfg: dit.DiTConfig,
    teacher_steps: int = 4,
    lr: float = 1e-4,
):
    """Student one-step jump matches the teacher's `teacher_steps` DDIM jump."""

    def loss_fn(student, teacher, x_T):
        tgt = jax.lax.stop_gradient(ddim_sample(cfg, teacher, x_T, teacher_steps))
        t999 = jnp.full((x_T.shape[0],), 999, jnp.int32)
        v, _ = dit.forward(cfg, student, x_T, t999)
        one_step = x_T.astype(jnp.float32) - v.astype(jnp.float32)  # full jump
        return jnp.mean((one_step - tgt.astype(jnp.float32)) ** 2)

    def step(student, teacher, x_T):
        loss, grads = jax.value_and_grad(loss_fn)(student, teacher, x_T)
        new = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), student, grads)
        return new, loss

    return step


def ema_update(ema_params, params, decay: float = 0.999):
    """EMA weights (the reference's EMA module)."""
    return jax.tree.map(
        lambda e, p: (decay * e.astype(jnp.float32) + (1 - decay) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params, params,
    )
