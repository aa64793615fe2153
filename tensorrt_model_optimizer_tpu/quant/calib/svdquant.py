"""SVDQuant: low-rank outlier branch + quantized residual.

Re-creates `model_calib.py:1980` svdquant() / `SVDQuantLinear`
(`quant_linear.py:117`): W = B @ A (top-r SVD) + Q(W - B @ A). The low-rank
branch stays high precision and maps directly onto this framework's LoRA
adapter machinery (`peft/lora.py`): the adapter carries U·S·V^T and the model
weight is replaced by the residual before calibration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def svd_split(w: jax.Array, rank: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Top-`rank` SVD factors: returns (A [r, K], B [O, r], residual [O, K])."""
    w32 = w.astype(jnp.float32)
    u, s, vt = jnp.linalg.svd(w32, full_matrices=False)
    B = u[:, :rank] * s[None, :rank]  # [O, r]
    A = vt[:rank, :]  # [r, K]
    resid = w32 - B @ A
    return A, B, resid.astype(w.dtype)


def svdquant_weights(
    params_layers: dict, names, rank: int = 16
) -> tuple[dict, dict]:
    """Split every projection; returns (layers-with-residuals, adapters).

    Adapters follow the peft layout {name: {"A": [L, r, K], "B": [L, O, r],
    "scale": [L]}} so `llama.forward(..., adapters=...)` adds the branch.
    """
    new_layers = dict(params_layers)
    adapters = {}
    for name in names:
        w = params_layers[name]  # [L, O, K]
        A, B, resid = jax.jit(jax.vmap(lambda wl: svd_split(wl, rank)))(w)
        new_layers[name] = resid
        adapters[name] = {
            "A": A.astype(w.dtype),
            "B": B.astype(w.dtype),
            "scale": jnp.ones((w.shape[0],), jnp.float32),
        }
    return new_layers, adapters
