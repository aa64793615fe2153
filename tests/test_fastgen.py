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
