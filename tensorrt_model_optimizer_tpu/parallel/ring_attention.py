"""Ring attention: context-parallel exact attention over a mesh axis.

The reference has NO sequence-parallel attention (SURVEY §5: CP appears only
as an amax-sync group); long context is delegated to serving engines. For a
TPU-native framework this is a first-class need (BASELINE config[3] multi-
host long-context decode), so it's implemented here directly:

 - Sequence is sharded over mesh axis `axis_name`; each device holds a local
   [B, T/P, ...] block of q, k, v.
 - P ring steps: attend q_local against the resident k/v block with a
   streaming (flash-style) softmax — running max m, denominator l, and
   accumulator — then rotate k/v around the ring with `lax.ppermute` (XLA
   lowers to ICI collective-permute; compute of step i overlaps the
   permute of step i+1 under XLA's async scheduling).
 - Causality uses global position offsets derived from `axis_index`.

Use under `shard_map` with q/k/v sharded on the sequence dim.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _block_attend(q, k, v, bias, m_prev, l_prev, acc):
    """One streaming-softmax block update. q [B,Tq,n,d], k/v [B,Tk,n,d]."""
    s = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    s = s / math.sqrt(q.shape[-1]) + bias  # bias: [1,1,Tq,Tk] mask
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))  # [B,n,Tq]
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1)
    acc = acc * corr[..., None] + jnp.einsum(
        "bnqk,bknd->bnqd", p.astype(v.dtype), v
    ).astype(jnp.float32)
    return m_new, l_new, acc


def ring_attention(q, k, v, axis_name: str, causal: bool = True):
    """Exact attention with sequence sharded over `axis_name`.

    q, k, v: [B, T_local, n_heads, head_dim] per device (GQA: repeat kv
    heads before calling). Returns [B, T_local, n_heads, head_dim].
    """
    B, Tq, n, d = q.shape
    P_sz = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)

    # pcast-to-varying: mark the fresh accumulators as device-varying over the ring
    # axis (jax>=0.9 shard_map tracks varying-axis types through scan).
    m = jax.lax.pcast(jnp.full((B, n, Tq), -jnp.inf, jnp.float32), axis_name, to='varying')
    l = jax.lax.pcast(jnp.zeros((B, n, Tq), jnp.float32), axis_name, to='varying')
    acc = jax.lax.pcast(jnp.zeros((B, n, Tq, d), jnp.float32), axis_name, to='varying')

    q_pos = my * Tq + jnp.arange(Tq)  # global positions of local queries

    def step(i, carry):
        m, l, acc, k_blk, v_blk = carry
        src = (my - i) % P_sz  # which device's block we hold at step i
        k_pos = src * Tq + jnp.arange(k_blk.shape[1])
        if causal:
            bias = jnp.where(
                k_pos[None, :] <= q_pos[:, None], 0.0, -jnp.inf
            )[None, None, :, :].astype(jnp.float32)
        else:
            bias = jnp.zeros((1, 1, Tq, k_blk.shape[1]), jnp.float32)
        m, l, acc = _block_attend(q, k_blk, v_blk, bias, m, l, acc)
        perm = [(j, (j + 1) % P_sz) for j in range(P_sz)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return m, l, acc, k_blk, v_blk

    m, l, acc, _, _ = jax.lax.fori_loop(0, P_sz, step, (m, l, acc, k, v))
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)  # [B,Tq,n,d]


def ring_attention_sharded(q, k, v, mesh, axis_name: str = "context", causal=True):
    """Convenience wrapper: shard_map over the sequence dimension."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        partial(ring_attention, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
