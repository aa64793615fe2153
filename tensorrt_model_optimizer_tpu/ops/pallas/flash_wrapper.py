"""Flash-attention wrapper (prefill/training hot path).

Dispatches to the in-repo GQA-aware Pallas kernel (`flash_gqa.py`) with
this codebase's conventions ([B, T, n, d] layout, bf16 in / bf16 out) and a
grouped-einsum jnp fallback for CPU tests. Neither path ever materializes
repeated K/V heads: the kernel indexes kv-head `h // rep` directly, and the
fallback folds the group dimension into the einsum. The quantized-softmax
(P-matrix QDQ) variant of the reference
(`kernels/common/attention/triton_fa.py`) composes on top by fake-
quantizing q/k/v before the call (the bmm-quantizer sites already do this).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def flash_attention(
    q: jax.Array,  # [B, T, n_heads, hd]
    k: jax.Array,  # [B, T, n_kv, hd]
    v: jax.Array,
    causal: bool = True,
    force_reference: Optional[bool] = None,
) -> jax.Array:
    """Returns [B, T, n_heads, hd]."""
    B, T, nH, hd = q.shape
    n_kv = k.shape[2]
    rep = nH // n_kv

    use_ref = force_reference
    if use_ref is None:
        try:
            use_ref = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:
            use_ref = True
    # both paths want [B, n, T, d]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if not use_ref:
        from .flash_gqa import flash_attention_gqa

        out = flash_attention_gqa(
            qt, kt, vt, causal=causal, sm_scale=1.0 / math.sqrt(hd)
        )
    else:
        # grouped reference: fold the GQA group into the einsum instead of
        # repeating K/V ([B, n_kv, rep, T, d] x [B, n_kv, S, d])
        qg = qt.reshape(B, n_kv, rep, T, hd)
        s = jnp.einsum(
            "bgrtd,bgsd->bgrts", qg, kt, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        if causal:
            S = kt.shape[2]
            mask = jnp.where(
                jnp.arange(S)[None, :] <= jnp.arange(T)[:, None], 0.0, -jnp.inf
            )
            s = s + mask[None, None, None]
        p = jax.nn.softmax(s, axis=-1).astype(vt.dtype)
        out = jnp.einsum("bgrts,bgsd->bgrtd", p, vt).reshape(B, nH, T, hd)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)
