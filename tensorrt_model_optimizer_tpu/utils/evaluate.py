"""Accuracy harnesses: perplexity + logit-divergence probes.

The reference's published accuracy anchors are MMLU deltas and wikitext
perplexity (SURVEY §4 accuracy harnesses). This module provides:
 - `perplexity`: next-token ppl of any (fake-quant or bf16) model over token
   batches — the wikitext-style anchor.
 - `logit_divergence`: KL between a quantized model and its bf16 reference —
   a data-efficient proxy used to attribute accuracy deltas per format.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama


def perplexity(
    model_cfg: llama.LlamaConfig,
    params: llama.Params,
    batches: Iterable[np.ndarray],
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[llama.QuantState] = None,
    adapters: Optional[dict] = None,
    forward_fn=None,
) -> float:
    """exp(mean next-token NLL) over the batches.

    `forward_fn` selects a non-llama model family's forward (registry
    families return (logits, state); adapters are llama-only).

    Params/qstate are jit ARGUMENTS, not captured constants: besides the
    usual compile-size argument, the axon relay backend corrupts subsequent
    host transfers of arrays it has baked into an executable as constants
    (observed on the anchor's down_proj; see hf_loader._verified_transfer).
    """

    @jax.jit
    def nll(params, qstate, adapters, tokens):
        if forward_fn is not None:
            logits = forward_fn(
                model_cfg, params, tokens[:, :-1], layout=layout, qstate=qstate
            )[0]
        else:
            logits, _, _ = llama.forward(
                model_cfg, params, tokens[:, :-1], layout=layout, qstate=qstate,
                adapters=adapters,
            )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
        return -jnp.sum(ll), ll.size

    total, count = 0.0, 0
    for b in batches:
        s, n = nll(params, qstate, adapters, jnp.asarray(b))
        total += float(s)
        count += int(n)
    return float(np.exp(total / max(count, 1)))


def logit_divergence(
    model_cfg: llama.LlamaConfig,
    params: llama.Params,
    batches: Iterable[np.ndarray],
    layout: llama.QuantLayout,
    qstate: llama.QuantState,
) -> float:
    """Mean KL(bf16 || quantized) over tokens — the accuracy-delta probe.

    Params/qstate ride as jit arguments (never captured constants — see
    `perplexity`)."""

    @jax.jit
    def kl(params, qstate, tokens):
        ref, _, _ = llama.forward(model_cfg, params, tokens)
        q, _, _ = llama.forward(model_cfg, params, tokens, layout=layout, qstate=qstate)
        p = jax.nn.softmax(ref.astype(jnp.float32), axis=-1)
        lp = jax.nn.log_softmax(ref.astype(jnp.float32), axis=-1)
        lq = jax.nn.log_softmax(q.astype(jnp.float32), axis=-1)
        return jnp.mean(jnp.sum(p * (lp - lq), axis=-1))

    vals = [float(kl(params, qstate, jnp.asarray(b))) for b in batches]
    return float(np.mean(vals))
