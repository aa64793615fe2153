"""Ring attention vs full attention parity on the 8-device CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tensorrt_model_optimizer_tpu.parallel import ring_attention as ra


def full_attention(q, k, v, causal=True):
    s = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    s = s / math.sqrt(q.shape[-1])
    T = q.shape[1]
    if causal:
        mask = jnp.where(jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -jnp.inf)
        s = s + mask[None, None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnqk,bknd->bqnd", p.astype(v.dtype), v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    shape = (2, 32, 4, 16)  # B, T, n, d ; T=32 over 8 devices -> 4 per device
    mk = lambda s: jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)
    return mk(1.0), mk(1.0), mk(1.0)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(qkv, causal):
    q, k, v = qkv
    devices = np.array(jax.devices()).reshape(8)
    mesh = Mesh(devices, axis_names=("context",))
    ref = full_attention(q, k, v, causal)
    out = ra.ring_attention_sharded(q, k, v, mesh, "context", causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_ring_in_jit(qkv):
    q, k, v = qkv
    devices = np.array(jax.devices()).reshape(8)
    mesh = Mesh(devices, axis_names=("context",))
    f = jax.jit(lambda q, k, v: ra.ring_attention_sharded(q, k, v, mesh))
    out = f(q, k, v)
    ref = full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
