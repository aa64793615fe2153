"""Minitron expert pruning for routed-MoE families.

The reference's mcore Minitron prunes `num_moe_experts` alongside the width
axes (`prune/plugins/mcore_minitron.py:109-110` exposes
`num_moe_experts` / `moe_shared_expert_intermediate_size` as prunable
hparams, importance = expert activation). TPU-native form: expert
importance is the mean routing probability over a calibration capture
(which experts the router actually uses), each layer keeps its own
top-`keep` experts, and the stacked [L, E, ...] leaves + router rows are
gathered down — a pure pytree transform, no module surgery.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def expert_importance(cfg, params, batches, forward_fn=None,
                      capture_tokens: int = 128) -> jnp.ndarray:
    """Mean routing probability per (layer, expert): [L, E].

    Uses the family forward's `moe_in` capture (the normed expert-block
    input) and the router weights directly — no forward changes needed."""
    from ..models import mixtral

    fwd = forward_fn or mixtral.forward
    caps_all = []
    cap = jax.jit(lambda t: fwd(cfg, params, t, capture_tokens=capture_tokens)[2])
    for b in batches:
        caps_all.append(cap(jnp.asarray(b))["moe_in"])  # [L, n, H]
    X = jnp.concatenate(caps_all, axis=1).astype(jnp.float32)
    router = params["layers"]["moe.router"].astype(jnp.float32)  # [L, E, H]
    logits = jnp.einsum("lnh,leh->lne", X, router)
    if cfg.router_bias:
        logits = logits + params["layers"]["moe.router__bias"][:, None, :]
    if cfg.router_sigmoid_input_scaled or cfg.router_softmax_after_topk:
        # top-k-style routers: usage = how often the expert is selected
        k = cfg.top_k
        top = jax.lax.top_k(logits, k)[1]  # [L, n, k]
        onehot = jax.nn.one_hot(top, cfg.num_experts, dtype=jnp.float32)
        return jnp.mean(jnp.sum(onehot, axis=2), axis=1)  # [L, E]
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.mean(probs, axis=1)  # [L, E]


def prune_experts(cfg, params, keep: int, scores: jnp.ndarray):
    """Keep each layer's `keep` highest-importance experts.

    Returns (new_cfg, new_params); router rows and every stacked
    [L, E, ...] moe leaf gather the kept experts (order preserved so
    routing stays stable)."""
    assert 1 <= keep <= cfg.num_experts
    L = cfg.num_hidden_layers
    s = np.asarray(scores)
    keep_idx = np.stack([
        np.sort(np.argsort(-s[l])[:keep]) for l in range(L)
    ])  # [L, keep]
    layers = dict(params["layers"])
    for name, arr in list(layers.items()):
        if not name.startswith("moe."):
            continue
        a = np.asarray(jnp.asarray(arr))
        gathered = np.stack([a[l, keep_idx[l]] for l in range(L)])
        layers[name] = jnp.asarray(gathered)
    new_params = dict(params)
    new_params["layers"] = layers
    new_cfg = dataclasses.replace(
        cfg, num_experts=keep, top_k=min(cfg.top_k, keep))
    return new_cfg, new_params


def prune_moe(cfg, params, batches, keep: int, forward_fn=None,
              capture_tokens: int = 128):
    """One-call Minitron expert pruning: score + gather."""
    scores = expert_importance(cfg, params, batches, forward_fn, capture_tokens)
    return prune_experts(cfg, params, keep, scores)
