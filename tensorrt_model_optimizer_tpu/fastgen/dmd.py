"""DMD2: Distribution Matching Distillation with adversarial critic.

Re-creates the reference DMD pipeline (`fastgen/methods/dmd.py:119`
DMDPipeline, `fastgen/losses.py`, `fastgen/discriminators.py:53`): three
loss entry points a training loop alternates between —

 - student: variational score distillation (VSD) + optional GAN generator
   term (`compute_student_loss`, dmd.py:458);
 - fake score: denoising score matching on student samples
   (`compute_fake_score_loss`, dmd.py:614);
 - discriminator: softplus GAN loss + approximate R1 regularizer
   (`compute_discriminator_loss`, dmd.py:693).

All three models share the DiT architecture (rectified-flow pred_type
"flow"); the discriminator reads the TEACHER's post-block token features
(`return_features=True` on dit.forward — the functional stand-in for the
reference's forward hooks, discriminators.py:56 `feature_indices`).
Functional JAX: losses are pure (params, batch, key) -> scalar functions,
the caller owns optimizers and the update alternation, exactly like the
reference ("the pipeline does not own optimizers").
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import dit

# ---------------------------------------------------------------------------
# Rectified-flow schedule (`fastgen/flow_matching.py` rf_alpha/rf_sigma)
# ---------------------------------------------------------------------------


def rf_alpha(t: jax.Array) -> jax.Array:
    return 1.0 - t


def rf_sigma(t: jax.Array) -> jax.Array:
    return t


def add_noise(x0: jax.Array, eps: jax.Array, t: jax.Array) -> jax.Array:
    """x_t = alpha_t x_0 + sigma_t eps (t broadcast over trailing dims)."""
    tb = t.reshape(t.shape + (1,) * (x0.ndim - t.ndim))
    return (rf_alpha(tb) * x0.astype(jnp.float32)
            + rf_sigma(tb) * eps.astype(jnp.float32)).astype(x0.dtype)


def predict_x0(cfg: dit.DiTConfig, params, x_t: jax.Array, t: jax.Array):
    """Run the DiT (flow parameterization v = eps - x0) and convert to x_0:
    x_0 = x_t - sigma_t * v  (`pred_x0_from_flow`)."""
    v, _ = dit.forward(cfg, params, x_t, (t * 999).astype(jnp.int32))
    tb = t.reshape(t.shape + (1,) * (x_t.ndim - t.ndim))
    return (x_t.astype(jnp.float32) - tb * v.astype(jnp.float32)).astype(x_t.dtype)


def sample_timesteps(key: jax.Array, batch: int) -> jax.Array:
    """Uniform perturbation timesteps in (eps, 1)."""
    return jax.random.uniform(key, (batch,), jnp.float32, 0.02, 0.98)


# ---------------------------------------------------------------------------
# Losses (`fastgen/losses.py`)
# ---------------------------------------------------------------------------


def vsd_loss(gen_data, teacher_x0, fake_score_x0):
    """VSD: pseudo-target = gen - (fake - teacher) * w, w = 1/mean|gen-teacher|
    per sample (losses.py:100). Gradient flows through gen_data only."""
    dims = tuple(range(1, gen_data.ndim))
    g32 = jax.lax.stop_gradient(gen_data).astype(jnp.float32)
    t32 = teacher_x0.astype(jnp.float32)
    w = 1.0 / (jnp.mean(jnp.abs(g32 - t32), axis=dims, keepdims=True) + 1e-6)
    vsd_grad = (fake_score_x0.astype(jnp.float32) - t32) * w
    pseudo = jax.lax.stop_gradient(g32 - vsd_grad)
    return 0.5 * jnp.mean((gen_data.astype(jnp.float32) - pseudo) ** 2)


def dsm_loss_flow(net_pred, x0, eps):
    """DSM in flow space: target v = eps - x0 (losses.py:47, pred_type='flow')."""
    tgt = eps.astype(jnp.float32) - x0.astype(jnp.float32)
    return jnp.mean((net_pred.astype(jnp.float32) - tgt) ** 2)


def gan_gen_loss(fake_logits):
    """E[softplus(-fake_logits)] (losses.py:143)."""
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


def gan_disc_loss(real_logits, fake_logits):
    """E[softplus(fake)] + E[softplus(-real)] (losses.py:153)."""
    return (jnp.mean(jax.nn.softplus(fake_logits.astype(jnp.float32)))
            + jnp.mean(jax.nn.softplus(-real_logits.astype(jnp.float32))))


def r1_loss(real_logits, perturbed_real_logits):
    """Approximate R1 (APT): penalize sensitivity to small real-data noise."""
    d = real_logits.astype(jnp.float32) - perturbed_real_logits.astype(jnp.float32)
    return jnp.mean(d**2)


# ---------------------------------------------------------------------------
# Discriminator over teacher features (`discriminators.py:67`)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    num_heads: int = 4  # independent logit heads (multi-head critic)
    hidden: int = 128


def init_discriminator(cfg: dit.DiTConfig, dcfg: DiscriminatorConfig,
                       key: jax.Array) -> dict:
    h = cfg.hidden_size
    k1, k2 = jax.random.split(key)
    return {
        "fc1": jax.random.normal(k1, (dcfg.hidden, h), jnp.float32) / math.sqrt(h),
        "fc1__bias": jnp.zeros((dcfg.hidden,), jnp.float32),
        "heads": jax.random.normal(k2, (dcfg.num_heads, dcfg.hidden), jnp.float32)
        / math.sqrt(dcfg.hidden),
    }


def discriminator_forward(disc: dict, feats: jax.Array) -> jax.Array:
    """feats [B, N, h] teacher token features -> logits [B, num_heads]."""
    pooled = jnp.mean(feats.astype(jnp.float32), axis=1)  # [B, h]
    z = jax.nn.silu(pooled @ disc["fc1"].T + disc["fc1__bias"])
    return z @ disc["heads"].T  # [B, heads]


# ---------------------------------------------------------------------------
# Pipeline: the three loss entry points
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DMDConfig:
    gan_loss_weight_gen: float = 5e-3  # 0 disables the GAN branch
    r1_weight: float = 1.0
    r1_noise_std: float = 0.01


def make_dmd_losses(cfg: dit.DiTConfig, dmd: DMDConfig = DMDConfig()):
    """Returns (student_loss, fake_score_loss, disc_loss) pure functions.

    student_loss(student, teacher, fake_score, disc|None, noise, key)
    fake_score_loss(fake_score, student, noise, key)
    disc_loss(disc, teacher, student, latents, noise, key)
    The caller alternates updates (dmd.py docstring: "callers drive the
    alternation"). One-step student: gen = predict_x0(student, noise, t=1).
    """

    def _student_generate(student, noise):
        t1 = jnp.ones((noise.shape[0],), jnp.float32)
        return predict_x0(cfg, student, noise, t1)

    def student_loss(student, teacher, fake_score, disc, noise, key):
        gen = _student_generate(student, noise)
        kt, ke = jax.random.split(key)
        t = sample_timesteps(kt, noise.shape[0])
        eps = jax.random.normal(ke, noise.shape, jnp.float32).astype(noise.dtype)
        perturbed = add_noise(gen, eps, t)
        fake_x0 = jax.lax.stop_gradient(predict_x0(cfg, fake_score, perturbed, t))
        # teacher forward keeps grad when GAN is on (features depend on gen)
        tt = (t * 999).astype(jnp.int32)
        v_t, _, feats = dit.forward(cfg, teacher, perturbed, tt, return_features=True)
        tb = t.reshape(t.shape + (1,) * (perturbed.ndim - 1))
        teacher_x0 = jax.lax.stop_gradient(
            perturbed.astype(jnp.float32) - tb * v_t.astype(jnp.float32)
        ).astype(perturbed.dtype)
        vsd = vsd_loss(gen, teacher_x0, fake_x0)
        out = {"vsd": vsd, "total": vsd}
        if disc is not None and dmd.gan_loss_weight_gen > 0:
            gg = gan_gen_loss(discriminator_forward(disc, feats))
            out = {"vsd": vsd, "gan_gen": gg,
                   "total": vsd + dmd.gan_loss_weight_gen * gg}
        return out["total"], out

    def fake_score_loss(fake_score, student, noise, key):
        gen = jax.lax.stop_gradient(_student_generate(student, noise))
        kt, ke = jax.random.split(key)
        t = sample_timesteps(kt, noise.shape[0])
        eps = jax.random.normal(ke, noise.shape, jnp.float32).astype(noise.dtype)
        perturbed = jax.lax.stop_gradient(add_noise(gen, eps, t))
        v_pred, _ = dit.forward(cfg, fake_score, perturbed, (t * 999).astype(jnp.int32))
        return dsm_loss_flow(v_pred, gen, eps)

    def disc_loss(disc, teacher, student, latents, noise, key):
        kt, ke, kr = jax.random.split(key, 3)
        gen = jax.lax.stop_gradient(_student_generate(student, noise))
        t = sample_timesteps(kt, noise.shape[0])
        eps = jax.random.normal(ke, noise.shape, jnp.float32).astype(noise.dtype)
        tt = (t * 999).astype(jnp.int32)
        _, _, fake_feat = dit.forward(cfg, teacher, add_noise(gen, eps, t), tt,
                                      return_features=True)
        _, _, real_feat = dit.forward(cfg, teacher, add_noise(latents, eps, t), tt,
                                      return_features=True)
        fake_lg = discriminator_forward(disc, jax.lax.stop_gradient(fake_feat))
        real_lg = discriminator_forward(disc, jax.lax.stop_gradient(real_feat))
        loss = gan_disc_loss(real_lg, fake_lg)
        if dmd.r1_weight > 0:
            pert = latents + dmd.r1_noise_std * jax.random.normal(
                kr, latents.shape, jnp.float32).astype(latents.dtype)
            _, _, pr_feat = dit.forward(cfg, teacher, add_noise(pert, eps, t), tt,
                                        return_features=True)
            pr_lg = discriminator_forward(disc, jax.lax.stop_gradient(pr_feat))
            loss = loss + dmd.r1_weight * r1_loss(real_lg, pr_lg)
        return loss

    return student_loss, fake_score_loss, disc_loss
