"""EAGLE speculative decoding: a one-layer draft transformer over hidden states.

Re-creates the reference's eagle mode (`speculative/eagle/eagle_model.py:21`,
`conversion.py:30`): the draft model consumes [token embedding ; base hidden
state] through a fusion projection and a single decoder layer, predicting the
base model's next hidden state / token. EAGLE-1 style (hidden regression +
LM head reuse).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..quant import qat as qat_mod
from .medusa import _hidden_states


@dataclasses.dataclass(frozen=True)
class EagleConfig:
    num_layers: int = 1


def init_eagle(cfg: llama.LlamaConfig, ecfg: EagleConfig, key: jax.Array) -> dict:
    """Draft params: fusion proj [H, 2H] + a 1-layer llama decoder."""
    h = cfg.hidden_size
    keys = jax.random.split(key, 3)
    draft_cfg = dataclasses.replace(
        cfg, num_hidden_layers=ecfg.num_layers, vocab_size=1  # no own embed/lm
    )
    base = llama.init_params(draft_cfg, keys[0])
    return {
        "fc": (jax.random.normal(keys[1], (h, 2 * h), jnp.float32) / math.sqrt(2 * h)).astype(cfg.dtype),
        "layers": base["layers"],
        "norm": base["norm"],
    }


def eagle_forward(cfg, params, eagle, tokens, base_hidden):
    """Draft forward: fuse(embed(tokens), base_hidden) -> next-hidden pred.

    tokens [B, T]; base_hidden [B, T, H] (the base model's hidden at the same
    positions). Returns (pred_hidden [B, T, H], draft_logits [B, T, V]).
    """
    B, T = tokens.shape
    emb = params["embed_tokens"][tokens].astype(cfg.dtype)
    fused = jnp.concatenate([emb, base_hidden.astype(cfg.dtype)], axis=-1)
    x = (fused @ eagle["fc"].T.astype(fused.dtype))
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )[None, None, :, :].astype(jnp.float32)
    lay = llama.QuantLayout(sites=())

    def body(carry, lp):
        x = carry
        x, _, _, _ = llama._decoder_layer(
            cfg, lay, False, x, lp, None, positions, mask, None
        )
        return x, None

    x, _ = jax.lax.scan(body, x, eagle["layers"])
    pred_hidden = llama.rms_norm(x, eagle["norm"], cfg.rms_norm_eps)
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (pred_hidden @ head_w.T.astype(pred_hidden.dtype)).astype(jnp.float32)
    return pred_hidden, logits


def make_eagle_train_step(cfg: llama.LlamaConfig, lr: float = 1e-3,
                          reg_weight: float = 0.1):
    """Train the draft: CE on next token + smooth-L1 hidden regression
    (the EAGLE combined objective)."""

    def loss_fn(eagle, params, tokens):
        hidden = jax.lax.stop_gradient(_hidden_states(cfg, params, tokens))
        # draft sees tokens t and hidden t, predicts token/hidden t+1
        pred_hidden, logits = eagle_forward(cfg, params, eagle, tokens, hidden)
        ce = qat_mod.cross_entropy(logits[:, :-1], tokens[:, 1:])
        diff = pred_hidden[:, :-1].astype(jnp.float32) - hidden[:, 1:].astype(jnp.float32)
        reg = jnp.mean(jnp.where(jnp.abs(diff) < 1, 0.5 * diff**2, jnp.abs(diff) - 0.5))
        return ce + reg_weight * reg

    def step(eagle, params, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(eagle, params, tokens)
        new = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), eagle, grads)
        return new, loss

    return step
