"""Medusa speculative decoding: extra draft heads + training + verification.

Re-creates the reference's medusa mode (`speculative/medusa/conversion.py:29`,
`medusa_model.py`): each draft head h predicts token t+1+h from the base
model's last hidden state through a residual block and its own LM head.
Functional: head params are a separate pytree; conversion = init; export =
the (base, heads) pair.

Serving-side: `propose_and_verify` runs the standard Medusa accept loop —
draft k tokens from the heads, verify with one base forward, accept the
longest matching prefix — and reports acceptance rate (the
`examples/specdec_bench` metric).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..quant import qat as qat_mod


@dataclasses.dataclass(frozen=True)
class MedusaConfig:
    num_heads: int = 4  # number of draft heads (predict t+1 ... t+num_heads)
    num_layers: int = 1  # residual blocks per head


def init_medusa(cfg: llama.LlamaConfig, mcfg: MedusaConfig, key: jax.Array) -> dict:
    """Head params: per head, residual block(s) + LM projection."""
    h, v = cfg.hidden_size, cfg.vocab_size
    keys = jax.random.split(key, mcfg.num_heads * (mcfg.num_layers + 1))
    heads = []
    ki = 0
    for _ in range(mcfg.num_heads):
        blocks = []
        for _ in range(mcfg.num_layers):
            blocks.append(
                (jax.random.normal(keys[ki], (h, h), jnp.float32) / math.sqrt(h)).astype(cfg.dtype)
            )
            ki += 1
        lm = (jax.random.normal(keys[ki], (v, h), jnp.float32) / math.sqrt(h)).astype(cfg.dtype)
        ki += 1
        heads.append({"blocks": blocks, "lm": lm})
    return {"heads": heads}


def _hidden_states(cfg, params, tokens, layout=None, qstate=None):
    """Base forward returning final hidden states [B, T, H] (pre-lm_head)."""
    # re-run the stack; llama.forward returns logits, so recompute hidden via
    # embedding of the pipeline: cheapest correct approach is to call forward
    # on a model whose lm_head is identity — instead we inline the last norm.
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    x = params["embed_tokens"][tokens].astype(cfg.dtype)
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )[None, None, :, :].astype(jnp.float32)
    lstate = llama._strip_global(qstate)
    lay = layout or llama.QuantLayout(sites=())

    def body(carry, per_layer):
        x = carry
        lp, ls = per_layer
        x, _, _, _ = llama._decoder_layer(
            cfg, lay, False, x, lp, ls, positions, mask, None
        )
        return x, None

    x, _ = jax.lax.scan(body, x, (params["layers"], lstate))
    return llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)


def medusa_logits(cfg, params, medusa, tokens, layout=None, qstate=None):
    """Returns (base_logits [B,T,V], head_logits [num_heads, B, T, V])."""
    hidden = _hidden_states(cfg, params, tokens, layout, qstate)
    head_w = params.get("lm_head", params["embed_tokens"])
    base_logits = (hidden @ head_w.T.astype(hidden.dtype)).astype(jnp.float32)
    outs = []
    for head in medusa["heads"]:
        hh = hidden
        for blk in head["blocks"]:
            hh = hh + jax.nn.silu((hh @ blk.T.astype(hh.dtype)).astype(jnp.float32)).astype(hh.dtype)
        outs.append((hh @ head["lm"].T.astype(hh.dtype)).astype(jnp.float32))
    return base_logits, jnp.stack(outs)


def apply_heads(medusa: dict, hidden: jax.Array, head_w: jax.Array) -> jax.Array:
    """Head logits from a hidden state (no base forward): [num_heads, ..., V].
    Factored out so the serving engine can drive medusa from its own cache."""
    outs = []
    for head in medusa["heads"]:
        hh = hidden
        for blk in head["blocks"]:
            hh = hh + jax.nn.silu((hh @ blk.T.astype(hh.dtype)).astype(jnp.float32)).astype(hh.dtype)
        outs.append((hh @ head["lm"].T.astype(hh.dtype)).astype(jnp.float32))
    return jnp.stack(outs)


def make_medusa_train_step(cfg: llama.LlamaConfig, lr: float = 1e-3):
    """Train heads only (base frozen): head h learns P(t+1+h | hidden_t)."""

    def loss_fn(medusa, params, tokens):
        base_logits, head_logits = medusa_logits(cfg, params, medusa, tokens)
        total = 0.0
        nh = head_logits.shape[0]
        for h in range(nh):
            off = h + 2  # head h predicts position t + h + 2 relative to input t+? (t+1 is base)
            if tokens.shape[1] <= off:
                continue
            logits_h = head_logits[h][:, : -(off)]
            targets = tokens[:, off:]
            total = total + qat_mod.cross_entropy(logits_h, targets)
        return total / nh

    def step(medusa, params, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(medusa, params, tokens)
        new = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), medusa, grads)
        return new, loss

    return step


def propose_and_verify(cfg, params, medusa, prompt, steps=16, layout=None, qstate=None):
    """Greedy Medusa decoding (linear chain, no tree) + acceptance stats.

    Each iteration: one base forward over [accepted so far + draft chain];
    the base model's own argmax verifies the chain; accept the longest
    matching prefix plus one bonus token. Returns (tokens, accept_rate).
    """
    B = prompt.shape[0]
    assert B == 1, "acceptance harness is single-sequence"
    nh = len(medusa["heads"])
    tokens = prompt
    accepted_total = 0
    proposed_total = 0
    produced = 0
    while produced < steps:
        base_logits, head_logits = medusa_logits(
            cfg, params, medusa, tokens, layout, qstate
        )
        nxt = jnp.argmax(base_logits[:, -1], axis=-1)  # verified token t+1
        draft = [int(jnp.argmax(head_logits[h][:, -1], axis=-1)[0]) for h in range(nh)]
        # verify: run base on tokens + [nxt] + draft, compare argmax chain
        chain = jnp.concatenate(
            [tokens, nxt[:, None], jnp.asarray([draft], jnp.int32)], axis=1
        )
        ver_logits, _, _ = llama.forward(cfg, params, chain, layout=layout, qstate=qstate)
        n_acc = 0
        for h in range(nh):
            pos = tokens.shape[1] + h  # position predicting draft[h]
            pred = int(jnp.argmax(ver_logits[0, pos]))
            if pred == draft[h]:
                n_acc += 1
            else:
                break
        keep = [int(nxt[0])] + draft[:n_acc]
        tokens = jnp.concatenate([tokens, jnp.asarray([keep], jnp.int32)], axis=1)
        produced += len(keep)
        accepted_total += n_acc
        proposed_total += nh
    rate = accepted_total / max(proposed_total, 1)
    return tokens, rate
