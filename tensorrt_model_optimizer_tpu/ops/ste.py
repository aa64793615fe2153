"""Straight-through-estimator wrappers for fake quantization.

The reference implements STE as torch autograd Functions whose backward clips
gradients outside +/-amax (`modelopt/torch/quantization/tensor_quant.py:291`).
Here each fake-quant family gets a `jax.custom_vjp` with the same contract:

 - static-amax formats: dL/dx = g * 1[|x| <= amax], dL/damax = 0
   (amax is calibration state, not trained — LSQ-style learned amax adds its
   own vjp later);
 - dynamic-block formats (NVFP4/MX activations): scales adapt to the tensor so
   nothing clips persistently -> identity backward
   (`tensor_quant.py:497` DynamicBlockQuantizationFunction);
 - `pass_through` mode: identity backward regardless (config
   `pass_through_bwd`, reference `config.py:634`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import numerics


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fake_quant_int_ste(x, amax, num_bits=8, unsigned=False, narrow_range=False):
    return numerics.fake_quant_int(x, amax, num_bits, unsigned, narrow_range)


def _fqi_fwd(x, amax, num_bits, unsigned, narrow_range):
    y = numerics.fake_quant_int(x, amax, num_bits, unsigned, narrow_range)
    return y, (x, amax)


def _fqi_bwd(num_bits, unsigned, narrow_range, res, g):
    x, amax = res
    mask = (jnp.abs(x.astype(jnp.float32)) <= amax.astype(jnp.float32)).astype(g.dtype)
    return g * mask, jnp.zeros_like(amax)


fake_quant_int_ste.defvjp(_fqi_fwd, _fqi_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fake_quant_fp_ste(x, amax, ebits=4, mbits=3):
    return numerics.fake_quant_fp(x, amax, ebits, mbits)


def _fqf_fwd(x, amax, ebits, mbits):
    y = numerics.fake_quant_fp(x, amax, ebits, mbits)
    return y, (x, amax)


def _fqf_bwd(ebits, mbits, res, g):
    x, amax = res
    mask = (jnp.abs(x.astype(jnp.float32)) <= amax.astype(jnp.float32)).astype(g.dtype)
    return g * mask, jnp.zeros_like(amax)


fake_quant_fp_ste.defvjp(_fqf_fwd, _fqf_bwd)


def _identity_bwd_wrap(fn):
    """Wrap a fake-quant fn of (x, *static) with identity-backward STE."""

    @jax.custom_vjp
    def wrapped(x):
        return fn(x)

    def fwd(x):
        return fn(x), None

    def bwd(_, g):
        return (g,)

    wrapped.defvjp(fwd, bwd)
    return wrapped


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _nvfp4_ste_with_amax(x, global_amax, block_size, axis):
    return numerics.fake_quant_nvfp4(x, block_size, global_amax, axis)


def _nvfp4_fwd(x, global_amax, block_size, axis):
    return numerics.fake_quant_nvfp4(x, block_size, global_amax, axis), global_amax


def _nvfp4_bwd(block_size, axis, global_amax, g):
    return g, jnp.zeros_like(global_amax)


_nvfp4_ste_with_amax.defvjp(_nvfp4_fwd, _nvfp4_bwd)


def fake_quant_nvfp4_ste(
    x: jax.Array,
    block_size: int = 16,
    global_amax: Optional[jax.Array] = None,
    axis: int = -1,
) -> jax.Array:
    """NVFP4 fake quant with identity STE backward (dynamic block scales).

    The global amax is an explicit custom_vjp argument — closing over a
    traced amax inside the vjp closure leaks tracers under jax.grad.
    """
    if global_amax is None:
        fn = _identity_bwd_wrap(
            lambda t: numerics.fake_quant_nvfp4(t, block_size, None, axis)
        )
        return fn(x)
    return _nvfp4_ste_with_amax(x, global_amax, block_size, axis)


def fake_quant_mx_ste(
    x: jax.Array, ebits: int, mbits: int, block_size: int = 32, axis: int = -1
) -> jax.Array:
    fn = _identity_bwd_wrap(
        lambda t: numerics.fake_quant_mx(t, ebits, mbits, block_size, axis)
    )
    return fn(x)


def pass_through(fn, x):
    """Apply `fn` forward with identity backward (pass_through_bwd mode)."""
    return _identity_bwd_wrap(fn)(x)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def fake_quant_int_lsq(x, amax, num_bits=8):
    """INT fake quant with the LSQ gradient wrt amax (learned scale,
    reference `lsq` algorithm, `model_calib.py:2296`): inside the range
    d y/d amax = (round(v) - v)/bound; at the clip boundary ±1."""
    return numerics.fake_quant_int(x, amax, num_bits)


def _lsq_fwd(x, amax, num_bits):
    return numerics.fake_quant_int(x, amax, num_bits), (x, amax)


def _lsq_bwd(num_bits, res, g):
    x, amax = res
    bound = float(2 ** (num_bits - 1) - 1)
    x32 = x.astype(jnp.float32)
    a32 = jnp.maximum(amax.astype(jnp.float32), 1e-12)
    scale = a32 / bound
    v = x32 / scale
    inside = jnp.abs(v) <= bound
    dx = g * inside.astype(g.dtype)
    # dq/damax per element; reduce over the axes amax broadcasts over
    dq_da = jnp.where(inside, (jnp.round(v) - v) / bound, jnp.sign(v))
    ga = (g.astype(jnp.float32) * dq_da)
    # sum over broadcasted dims to match amax's shape
    extra = ga.ndim - amax.ndim
    if extra > 0:
        ga = jnp.sum(ga, axis=tuple(range(extra)))
    for ax in range(amax.ndim):
        if amax.shape[ax] == 1 and ga.shape[ax] != 1:
            ga = jnp.sum(ga, axis=ax, keepdims=True)
    return dx, ga.astype(jnp.float32).reshape(amax.shape)


fake_quant_int_lsq.defvjp(_lsq_fwd, _lsq_bwd)
