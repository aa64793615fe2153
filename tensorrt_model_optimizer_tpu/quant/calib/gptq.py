"""GPTQ: Hessian-compensated weight quantization (`model_calib.py:2192`).

Process the weight in column blocks using H = X^T X from calibration
activations; quantize each column on its target grid, then propagate the
quantization error through the inverse-Hessian rows so later columns absorb
it (OBS update) — the same engine as SparseGPT with "quantize" in place of
"prune" (`sparsity/sparsegpt.py`).

TPU-first: columns-in-a-block loop is a `lax.fori_loop`, all O rows in
parallel, layers via vmap. The quantization grid (INT4 block / INT8 / FP8 /
NVFP4) comes in as a per-element amax so one implementation serves every
format.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ...ops import numerics
from ..quantizer import QuantizerConfig
from .mse import mse_amax_search  # noqa: F401  (re-export convenience)


def gptq_quantize(
    w: jax.Array,  # [O, K]
    H: jax.Array,  # [K, K] (see sparsity.sparsegpt.hessian_from_acts)
    quant_col: Callable[[jax.Array, jax.Array], jax.Array],
    amax_full: jax.Array,  # [O, K] element-wise amax grid
    block: int = 128,
) -> jax.Array:
    """Returns the GPTQ-updated fake-quantized weight [O, K]."""
    O, K = w.shape
    block = min(block, K)
    if K % block:
        block = 1
    Hinv = jnp.linalg.cholesky(jnp.linalg.inv(H)).T  # rows index columns
    d = jnp.diag(Hinv)
    w32 = w.astype(jnp.float32)
    nblocks = K // block

    def blk(bi, W):
        start = bi * block
        Wb = jax.lax.dynamic_slice(W, (0, start), (O, block))
        db = jax.lax.dynamic_slice(d, (start,), (block,))
        Ab = jax.lax.dynamic_slice(amax_full, (0, start), (O, block))

        def col(ci, st):
            Wb, err_acc = st
            wcol = Wb[:, ci]
            q = quant_col(wcol, Ab[:, ci])
            err = (wcol - q) / db[ci]
            row = jax.lax.dynamic_slice(Hinv, (start + ci, start), (1, block))[0]
            colmask = (jnp.arange(block) > ci)[None, :]
            Wb = Wb - err[:, None] * row[None, :] * colmask
            Wb = Wb.at[:, ci].set(q)
            err_acc = err_acc + err[:, None] * jax.lax.dynamic_slice(
                Hinv, (start + ci, 0), (1, K)
            )
            return Wb, err_acc

        Wb, err_acc = jax.lax.fori_loop(
            0, block, col, (Wb, jnp.zeros((O, K), jnp.float32))
        )
        W = jax.lax.dynamic_update_slice(W, Wb, (0, start))
        later = (jnp.arange(K) >= start + block)[None, :]
        return W - err_acc * later

    Wq = jax.lax.fori_loop(0, nblocks, blk, w32)
    return Wq.astype(w.dtype)


def gptq_int_col(num_bits: int):
    """Column quantizer on the symmetric INT grid."""

    def quant_col(col: jax.Array, amax: jax.Array) -> jax.Array:
        return numerics.fake_quant_int(col, amax, num_bits)

    return quant_col


def amax_grid_for(w: jax.Array, wcfg: QuantizerConfig) -> jax.Array:
    """Element-wise amax grid per the weight quantizer config (from the
    ORIGINAL weights, like the reference: scales fixed before the loop)."""
    base = wcfg.sequential[0] if wcfg.sequential else wcfg
    w32 = jnp.abs(w.astype(jnp.float32))
    if base.block is not None and base.block.sizes:
        return numerics.block_reduce_amax(w32, base.block.sizes)
    if base.axis is not None:
        kept = tuple(a % w.ndim for a in base.axis)
        red = tuple(i for i in range(w.ndim) if i not in kept)
        return jnp.broadcast_to(jnp.max(w32, axis=red, keepdims=True), w.shape)
    return jnp.broadcast_to(jnp.max(w32), w.shape)


def gptq_calibrate_weight(w, x, wcfg: QuantizerConfig, block: int = 128, damp: float = 0.01):
    """One-call GPTQ for a linear: activations x [n_tok, K], weight [O, K].

    Returns the error-compensated fake-quantized weight (store it in place of
    the original; the quantizer then sees values already on its grid).
    """
    from ...sparsity.sparsegpt import hessian_from_acts

    base = wcfg.sequential[0] if wcfg.sequential else wcfg
    H = hessian_from_acts(x, damp)
    amax_full = amax_grid_for(w, wcfg)
    if base.is_fp:
        e, m = base.num_bits
        qc = lambda col, am: numerics.fake_quant_fp(col, am, e, m)
    else:
        qc = gptq_int_col(base.num_bits)
    return gptq_quantize(w, H, qc, amax_full, block)
