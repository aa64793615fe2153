"""Pipeline parallelism: microbatched layer-staged forward over a mesh axis.

The reference delegates PP to Megatron (SURVEY §2.4); here it's native: the
stacked layer dim is sharded over mesh axis "pipe" (each device owns L/P
contiguous layers), a GPipe schedule streams M microbatches through the
stages, and activations hop stages with `lax.ppermute` (ICI
collective-permute). Embedding/norm/lm_head are replicated; every stage
computes the embed/head but only stage 0's input and the last stage's
output matter — the final psum selects the last stage's logits.

P + M - 1 schedule ticks; bubble fraction (P-1)/(P+M-1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models import llama


def _local_layers_forward(cfg, layout, lp_local, lstate, x, positions, mask):
    """Run a stage's local layer shard (scan) over hidden states x."""

    def body(carry, per_layer):
        h = carry
        lp, ls = per_layer
        h, _, _, _ = llama._decoder_layer(
            cfg, layout, False, h, lp, ls, positions, mask, None
        )
        return h, None

    x, _ = jax.lax.scan(body, x, (lp_local, lstate))
    return x


def pipeline_forward(
    cfg: llama.LlamaConfig,
    params: llama.Params,
    tokens: jax.Array,
    mesh,
    axis: str = "pipe",
    num_microbatches: Optional[int] = None,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[llama.QuantState] = None,
):
    """Pipelined forward. tokens [B, T] with B divisible by num_microbatches.

    params["layers"] leaves must be shardable on their leading (layer) dim
    over `axis`. Returns logits [B, T, V] (replicated).
    """
    from jax import shard_map

    lay = layout or llama.QuantLayout(sites=())
    P_sz = mesh.shape[axis]
    B, T = tokens.shape
    M = num_microbatches or P_sz
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"
    mb = B // M

    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (mb, T)).astype(jnp.int32)
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )[None, None, :, :].astype(jnp.float32)

    layer_spec = jax.tree.map(lambda _: P(axis), params["layers"])
    lstate = llama._strip_global(qstate)
    lstate_spec = jax.tree.map(lambda _: P(axis), lstate) if lstate else None

    def stage_fn(layers_local, lstate_local, tokens_all):
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == P_sz - 1
        H = cfg.hidden_size
        toks = tokens_all.reshape(M, mb, T)

        def embed(i):
            return params["embed_tokens"][toks[i]].astype(cfg.dtype)

        buf = jnp.zeros((mb, T, H), cfg.dtype)
        out = jnp.zeros((M, mb, T, cfg.vocab_size), jnp.float32)
        perm = [(i, (i + 1) % P_sz) for i in range(P_sz)]

        for t in range(M + P_sz - 1):
            # stage 0 injects microbatch t; other stages use the arriving buf
            inject = t < M
            if inject:
                buf = jnp.where(is_first, embed(min(t, M - 1)), buf)
            idx = t - stage  # microbatch this stage processes at tick t
            valid = jnp.logical_and(idx >= 0, idx < M)
            processed = _local_layers_forward(
                cfg, lay, layers_local, lstate_local, buf, positions, mask
            )
            processed = jnp.where(valid, processed, buf)
            # last stage: head + store
            h = llama.rms_norm(processed, params["norm"], cfg.rms_norm_eps)
            head_w = params.get("lm_head", params["embed_tokens"])
            logits = (h @ head_w.T.astype(h.dtype)).astype(jnp.float32)
            store = jnp.logical_and(valid, is_last)
            safe_idx = jnp.clip(idx, 0, M - 1)
            out = jnp.where(
                store,
                jax.lax.dynamic_update_index_in_dim(out, logits, safe_idx, 0),
                out,
            )
            # rotate activations to the next stage
            buf = jax.lax.ppermute(processed, axis, perm)

        # only the last stage holds real outputs; psum selects them
        out = jnp.where(is_last, out, jnp.zeros_like(out))
        out = jax.lax.psum(out, axis)
        return out.reshape(B, T, cfg.vocab_size)

    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(layer_spec, lstate_spec, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(params["layers"], lstate, tokens)
