"""Hadamard rotation (RHT) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.ops import hadamard, numerics
from tensorrt_model_optimizer_tpu.quant import QuantizerConfig, collect, init_state, quantize


def test_fwht_orthonormal():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    y = hadamard.fwht(x)
    # involution: H H = I for orthonormal symmetric H
    back = hadamard.fwht(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-5)
    # norm preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x)), np.linalg.norm(np.asarray(y)), rtol=1e-5)


def test_pair_rotation_preserves_matmul():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    ref = x @ w.T
    out = hadamard.fwht(x) @ hadamard.fwht(w).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_blocked_non_pow2():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 96)).astype(np.float32))  # 96 = 32*3
    y = hadamard.blocked_fwht(x)
    back = hadamard.blocked_fwht(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_rotation_flattens_outliers_and_improves_int4():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(128, 64)).astype(np.float32)
    x[:, 7] *= 50.0  # outlier channel
    x = jnp.asarray(x)
    plain_cfg = QuantizerConfig(num_bits=4)
    rot_cfg = QuantizerConfig(num_bits=4, rotate=True)
    st_p = collect(x, plain_cfg, init_state(plain_cfg, x.shape))
    st_r = collect(x, rot_cfg, init_state(rot_cfg, x.shape))
    qp = quantize(x, plain_cfg, st_p)
    qr_rot = quantize(x, rot_cfg, st_r)  # rotated-space values
    # error measured in the rotated space vs rotated input
    xr = hadamard.blocked_fwht(x)
    e_plain = float(jnp.mean((qp - x) ** 2))
    e_rot = float(jnp.mean((qr_rot - xr) ** 2))
    assert e_rot < e_plain * 0.5  # outlier energy spread over all dims


def test_rotated_pair_site_end_to_end():
    """Input site + weight site both rotated: fp path exact; int8 path close."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    icfg = QuantizerConfig(enable=False, rotate=True)
    wcfg = QuantizerConfig(enable=False, rotate=True)
    xr = quantize(x, icfg, None)
    wr = quantize(w, wcfg, None)
    np.testing.assert_allclose(np.asarray(xr @ wr.T), np.asarray(x @ w.T),
                               rtol=1e-4, atol=1e-4)


def test_flash_wrapper_reference_path():
    """CPU reference path of the flash wrapper matches plain attention."""
    import math

    from tensorrt_model_optimizer_tpu.ops.pallas import flash_wrapper as fw

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 16, 4, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 16, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 16, 2, 8)).astype(np.float32))
    out = fw.flash_attention(q, k, v, causal=True, force_reference=True)
    # manual reference with GQA repeat
    kr = jnp.repeat(k, 2, axis=2)
    vr = jnp.repeat(v, 2, axis=2)
    s = jnp.einsum("btnd,bsnd->bnts", q, kr) / math.sqrt(8)
    mask = jnp.where(jnp.arange(16)[None, :] <= jnp.arange(16)[:, None], 0.0, -np.inf)
    p = jax.nn.softmax(s + mask[None, None], axis=-1)
    ref = jnp.einsum("bnts,bsnd->btnd", p, vr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
