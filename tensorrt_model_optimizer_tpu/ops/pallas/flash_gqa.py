"""GQA-aware causal flash attention (Pallas).

Replaces the round-1 path that fed jax's bundled flash kernel (equal head
counts only) by materializing K/V with `jnp.repeat` — for a llama-8B
(32 q-heads over 8 kv-heads) that copy quadruples K/V HBM traffic and
resident bytes before the kernel even starts, which is why the bundled
kernel lost to XLA's fused einsum (VERDICT r1, weak #7). Here the K/V
BlockSpec index maps divide the head grid index by the group size, so each
kv-head's tiles are streamed once per group directly from the original
[B, Hkv, S, d] array and no repeated copy ever exists.

Reference counterpart: `kernels/common/attention/triton_fa.py` (the
quantized-softmax variant composes on top by fake-quantizing q/k/v at the
bmm sites before the call, as in round 1).

Standard flash-v2 running softmax, fp32 accumulators in VMEM scratch.
Causal masking is structural where possible: k-tiles entirely above the
diagonal skip the QK dot, the exp, and the PV dot outright.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale, bq, bk, causal, q_ref, k_ref, v_ref, o_ref,
            m_ref, l_ref, acc_ref):
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_kt = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # tiles fully above the causal diagonal contribute nothing: skip the
    # dots entirely, not just the state update
    live = (j * bk <= i * bq + bq - 1) if causal else True

    @pl.when(live)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # [bq, d]
        k = k_ref[0, 0].astype(jnp.float32)  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]
        if causal:
            rows = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(cols <= rows, s, -1e30)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if causal:
            # rows with no unmasked entry yet have m_new = -1e30 and
            # exp(s - m_new) = 1 garbage; zero masked lanes explicitly
            p = jnp.where(s > -1e29, p, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new

    @pl.when(j == n_kt - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


def flash_attention_gqa(
    q: jax.Array,  # [B, H, Tq, d]
    k: jax.Array,  # [B, Hkv, Tk, d]  (H % Hkv == 0)
    v: jax.Array,  # [B, Hkv, Tk, d]
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Returns [B, H, Tq, d]; K/V are indexed per-group, never repeated."""
    B, H, Tq, d = q.shape
    Hkv, Tk = k.shape[1], k.shape[2]
    assert H % Hkv == 0, (H, Hkv)
    rep = H // Hkv
    bq = min(block_q, Tq)
    bk = min(block_k, Tk)
    while Tq % bq:
        bq //= 2
    while Tk % bk:
        bk //= 2
    nq, nk = Tq // bq, Tk // bk
    if interpret is None:
        from .qmm import _interpret

        interpret = _interpret()
    scale = 1.0 / math.sqrt(d) if sm_scale is None else sm_scale
    kern = functools.partial(_kernel, scale, bq, bk, causal)
    return pl.pallas_call(
        kern,
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
            # the GQA point: kv tiles come from head h // rep of the
            # ORIGINAL array — no repeated copy is ever materialized
            pl.BlockSpec((1, 1, bk, d), lambda b, h, i, j: (b, h // rep, j, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, i, j: (b, h // rep, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
