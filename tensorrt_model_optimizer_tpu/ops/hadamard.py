"""Fast Walsh-Hadamard transform — the rotation (RHT/QuaRot) primitive.

The reference's `rotate` quantizer option applies a randomized Hadamard
transform before quantization to flatten activation outliers
(`QuantizerAttributeConfig.rotate`, `tensor_quantizer.py:1150`). Here: an
orthonormal FWHT in log2(n) butterfly steps (pure jnp reshapes/adds — XLA
fuses it; O(n log n), no materialized H matrix). H is symmetric orthonormal,
so rotating both the activation and the weight's input dim preserves the
matmul exactly: (x H)(W H)^T = x W^T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def fwht(x: jax.Array, axis: int = -1) -> jax.Array:
    """Orthonormal fast Walsh-Hadamard transform along `axis` (dim = 2^k)."""
    ax = axis % x.ndim
    n = x.shape[ax]
    if not is_pow2(n):
        raise ValueError(f"FWHT dim must be a power of 2, got {n}")
    x = jnp.moveaxis(x, ax, -1)
    shape = x.shape
    h = 1
    while h < n:
        x = x.reshape(*shape[:-1], n // (2 * h), 2, h)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = jnp.stack([a + b, a - b], axis=-2)
        h *= 2
    x = x.reshape(shape) / jnp.sqrt(jnp.asarray(n, x.dtype))
    return jnp.moveaxis(x, -1, ax)


def largest_pow2_divisor(n: int) -> int:
    return n & (-n)


def blocked_fwht(x: jax.Array, axis: int = -1) -> jax.Array:
    """FWHT over the largest power-of-2 blocks dividing the dim (non-pow2
    dims rotate blockwise, like grouped Hadamard in QuaRot)."""
    ax = axis % x.ndim
    n = x.shape[ax]
    b = largest_pow2_divisor(n)
    if b == n:
        return fwht(x, ax)
    x = jnp.moveaxis(x, ax, -1)
    shape = x.shape
    x = x.reshape(*shape[:-1], n // b, b)
    x = fwht(x, -1)
    return jnp.moveaxis(x.reshape(shape), -1, ax)
