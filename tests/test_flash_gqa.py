"""GQA flash kernel vs grouped-einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.ops.pallas.flash_gqa import flash_attention_gqa
from tensorrt_model_optimizer_tpu.ops.pallas.flash_wrapper import flash_attention


def _ref(q, k, v, causal):
    # wrapper reference path wants [B, T, n, d]
    out = flash_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        causal=causal, force_reference=True,
    )
    return jnp.swapaxes(out, 1, 2)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("rep", [1, 4])
def test_kernel_matches_reference(causal, rep):
    B, Hkv, T, d = 2, 2, 64, 32
    H = Hkv * rep
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, T, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, T, d), jnp.float32)
    out = flash_attention_gqa(
        q, k, v, causal=causal, block_q=16, block_k=16, interpret=True
    )
    ref = _ref(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_uneven_q_kv_len():
    """Decode-style Tq < Tk (no causal: suffix alignment is the caller's job)."""
    B, Hkv, rep, Tq, Tk, d = 1, 2, 2, 16, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, Hkv * rep, Tq, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, Tk, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, Tk, d), jnp.float32)
    out = flash_attention_gqa(
        q, k, v, causal=False, block_q=16, block_k=16, interpret=True
    )
    ref = _ref(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_wrapper_gqa_reference_path_matches_repeat():
    """The grouped-einsum fallback equals the plain repeat formulation."""
    B, T, Hkv, rep, d = 2, 24, 2, 3, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (B, T, Hkv * rep, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, Hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, Hkv, d), jnp.float32)
    out = flash_attention(q, k, v, causal=True, force_reference=True)
    kr = jnp.repeat(k, rep, axis=2)
    vr = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("btnd,bsnd->bnts", q, kr) / np.sqrt(d)
    mask = jnp.where(jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -jnp.inf)
    p = jax.nn.softmax(s + mask[None, None], axis=-1)
    ref = jnp.einsum("bnts,bsnd->btnd", p, vr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
