"""Flash-attention wrapper (prefill/training hot path).

Wraps jax's bundled Pallas TPU flash attention with this codebase's
conventions ([B, T, n, d] layout, GQA repeat, bf16 in / bf16 out) and a jnp
fallback for CPU tests. The quantized-softmax (P-matrix QDQ) variant of the
reference (`kernels/common/attention/triton_fa.py`) composes on top by fake-
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
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    use_ref = force_reference
    if use_ref is None:
        try:
            use_ref = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:
            use_ref = True
    # the kernel wants [B, n, T, d]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if not use_ref:
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        out = fa.flash_attention(
            qt, kt, vt, causal=causal, sm_scale=1.0 / math.sqrt(hd)
        )
    else:
        s = jnp.einsum("bntd,bnsd->bnts", qt, kt, preferred_element_type=jnp.float32)
        s = s / math.sqrt(hd)
        if causal:
            mask = jnp.where(
                jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -jnp.inf
            )
            s = s + mask[None, None]
        p = jax.nn.softmax(s, axis=-1).astype(vt.dtype)
        out = jnp.einsum("bnts,bnsd->bntd", p, vt)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)
