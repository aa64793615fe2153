"""FastGen diffusion trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.fastgen import trainers
from tensorrt_model_optimizer_tpu.models import dit


@pytest.fixture(scope="module")
def setup():
    cfg = dit.DiTConfig.tiny()
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    params["final_proj"] = jax.random.normal(
        jax.random.PRNGKey(1), params["final_proj"].shape, jnp.float32) * 0.05
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    return cfg, params, x0


def test_flow_matching_reduces_loss(setup):
    cfg, params, x0 = setup
    step = jax.jit(trainers.make_flow_matching_step(cfg, lr=5e-3))
    key = jax.random.PRNGKey(0)
    # fixed key: same (noise, t) draw each step so the descent is visible
    p, l0 = step(params, x0, key)
    for i in range(8):
        p, l = step(p, x0, key)
    assert float(l) < float(l0)


def test_ddim_sample_shapes(setup):
    cfg, params, x0 = setup
    xT = jnp.asarray(np.random.default_rng(3).normal(size=x0.shape).astype(np.float32))
    out = trainers.ddim_sample(cfg, params, xT, steps=4)
    assert out.shape == x0.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_fewstep_distillation_reduces_loss(setup):
    cfg, params, x0 = setup
    xT = jnp.asarray(np.random.default_rng(4).normal(size=x0.shape).astype(np.float32))
    step = jax.jit(trainers.make_distill_fewstep_step(cfg, teacher_steps=4, lr=5e-3))
    student = dit.init_params(cfg, jax.random.PRNGKey(5))
    student["final_proj"] = params["final_proj"]
    student, l0 = step(student, params, xT)
    for _ in range(6):
        student, l = step(student, params, xT)
    assert float(l) < float(l0)


def test_ema(setup):
    cfg, params, _ = setup
    p2 = jax.tree.map(lambda a: a + 1.0, params)
    ema = trainers.ema_update(params, p2, decay=0.5)
    w0 = np.asarray(jax.tree.leaves(params)[0])
    we = np.asarray(jax.tree.leaves(ema)[0])
    np.testing.assert_allclose(we, w0 + 0.5, rtol=1e-5)


class TestDMD:
    def _setup(self):
        from tensorrt_model_optimizer_tpu.fastgen import dmd as D
        from tensorrt_model_optimizer_tpu.models import dit

        cfg = dit.DiTConfig.tiny()
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        student = dit.init_params(cfg, ks[0])
        teacher = dit.init_params(cfg, ks[1])
        fake = dit.init_params(cfg, ks[2])
        disc = D.init_discriminator(cfg, D.DiscriminatorConfig(), ks[3])
        B = 2
        noise = jax.random.normal(jax.random.PRNGKey(5),
                                  (B, cfg.img_size, cfg.img_size, cfg.in_channels),
                                  jnp.float32)
        latents = jax.random.normal(jax.random.PRNGKey(6), noise.shape, jnp.float32)
        return D, dit, cfg, student, teacher, fake, disc, noise, latents

    def test_vsd_loss_weighting(self):
        from tensorrt_model_optimizer_tpu.fastgen import dmd as D

        g = jnp.ones((2, 4, 4, 1))
        t = jnp.zeros_like(g)
        f = jnp.zeros_like(g)
        # fake == teacher -> pseudo-target == gen -> zero loss
        assert float(D.vsd_loss(g, t, t)) == 0.0
        assert float(D.vsd_loss(g, t, f + 0.5)) > 0.0

    def test_student_loss_and_grad(self):
        D, dit_m, cfg, student, teacher, fake, disc, noise, latents = self._setup()
        sl, _, _ = D.make_dmd_losses(cfg, D.DMDConfig(gan_loss_weight_gen=1e-2))
        (total, parts), grads = jax.value_and_grad(sl, has_aux=True)(
            student, teacher, fake, disc, noise, jax.random.PRNGKey(7))
        assert np.isfinite(float(total))
        assert "gan_gen" in parts
        # adaLN-zero init zeroes patch_embed's grad path; final_proj sees grad
        gn = float(jnp.linalg.norm(grads["final_proj"]))
        assert np.isfinite(gn) and gn > 0

    def test_fake_score_and_disc_losses(self):
        D, dit_m, cfg, student, teacher, fake, disc, noise, latents = self._setup()
        _, fsl, dl = D.make_dmd_losses(cfg, D.DMDConfig())
        l1 = fsl(fake, student, noise, jax.random.PRNGKey(8))
        assert np.isfinite(float(l1)) and float(l1) > 0
        g = jax.grad(dl)(disc, teacher, student, latents, noise, jax.random.PRNGKey(9))
        gn = float(jnp.linalg.norm(g["fc1"]))
        assert np.isfinite(gn) and gn > 0

    def test_disc_separates_after_updates(self):
        """A few critic steps should push fake logits below real logits."""
        D, dit_m, cfg, student, teacher, fake, disc, noise, latents = self._setup()
        _, _, dl = D.make_dmd_losses(cfg, D.DMDConfig(r1_weight=0.0))
        step = jax.jit(lambda d, k: (dl(d, teacher, student, latents, noise, k),
                                     jax.grad(dl)(d, teacher, student, latents, noise, k)))
        for i in range(20):
            loss, g = step(disc, jax.random.PRNGKey(i))
            disc = jax.tree.map(lambda p, gg: p - 0.05 * gg, disc, g)
        t1 = jnp.ones((noise.shape[0],), jnp.float32)
        gen = D.predict_x0(cfg, student, noise, t1)
        tt = jnp.zeros((2,), jnp.int32) + 400
        _, _, ff = dit_m.forward(cfg, teacher, gen, tt, return_features=True)
        _, _, rf = dit_m.forward(cfg, teacher, latents, tt, return_features=True)
        fl = float(jnp.mean(D.discriminator_forward(disc, ff)))
        rl = float(jnp.mean(D.discriminator_forward(disc, rf)))
        assert rl > fl, (rl, fl)
