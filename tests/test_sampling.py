"""Sampling tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_model_optimizer_tpu.serve import sampling


def test_greedy():
    logits = jnp.asarray([[1.0, 5.0, 2.0], [3.0, 0.0, 0.1]])
    out = sampling.sample(logits, jax.random.PRNGKey(0), sampling.SamplingConfig())
    np.testing.assert_array_equal(np.asarray(out), [1, 0])


def test_top_k_restricts():
    logits = jnp.asarray([[0.0, 10.0, 9.0, -5.0]])
    cfg = sampling.SamplingConfig(temperature=1.0, top_k=2)
    outs = {int(sampling.sample(logits, jax.random.PRNGKey(i), cfg)[0]) for i in range(50)}
    assert outs <= {1, 2}


def test_top_p_keeps_best():
    logits = jnp.asarray([[0.0, 100.0, 0.0, 0.0]])
    cfg = sampling.SamplingConfig(temperature=1.0, top_p=0.1)
    outs = {int(sampling.sample(logits, jax.random.PRNGKey(i), cfg)[0]) for i in range(20)}
    assert outs == {1}


def test_temperature_randomizes():
    logits = jnp.zeros((1, 8))
    cfg = sampling.SamplingConfig(temperature=1.0)
    outs = {int(sampling.sample(logits, jax.random.PRNGKey(i), cfg)[0]) for i in range(40)}
    assert len(outs) > 3


def test_jit():
    cfg = sampling.SamplingConfig(temperature=0.7, top_k=4, top_p=0.9)
    f = jax.jit(lambda l, k: sampling.sample(l, k, cfg))
    out = f(jnp.ones((2, 16)), jax.random.PRNGKey(0))
    assert out.shape == (2,)
