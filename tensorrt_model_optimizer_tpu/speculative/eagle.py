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


# --------------------------------------------------------------------------
# EAGLE-3 Training-Time-Test (TTT): multi-step draft training
# --------------------------------------------------------------------------


def ttt_attention_mask(T: int, s: int, S_total: int) -> jnp.ndarray:
    """Additive mask [1,1,T,S_total] for TTT step `s`.

    Reference `get_ttt_msk_func` (`speculative/utils.py:539`): a query at
    local position q attends to original-sequence KV at kv <= q - s, plus one
    diagonal entry per earlier TTT step i: kv == q + i*T - (s - i) within
    block i. Unwritten KV (blocks > s) stays masked.
    """
    q_idx = jnp.arange(T)[:, None]
    kv_idx = jnp.arange(S_total)[None, :]
    allow = kv_idx <= (q_idx - s)
    for i in range(1, s + 1):
        blk = (kv_idx == q_idx + i * T - (s - i)) & (kv_idx >= i * T)
        allow = allow | blk
    allow = allow & (kv_idx < (s + 1) * T)
    return jnp.where(allow, 0.0, -1e9)[None, None].astype(jnp.float32)


def eagle_ttt_forward(cfg, params, eagle, tokens, base_hidden, ttt_steps: int):
    """Run the draft for `ttt_steps` recursive steps with accumulated KV.

    Step 0 consumes the base model's hidden states; step s>0 consumes the
    draft's own step-(s-1) predictions rolled right by one (`hf_eagle.py:793`
    `.roll(1, 1)`), attending to all earlier steps' KV through the TTT mask.
    Returns a list of (pred_hidden, logits) per step.
    """
    B, T = tokens.shape
    H = cfg.hidden_size
    nKV, hd = cfg.num_key_value_heads, cfg.hd
    L = eagle["layers"]["input_layernorm"].shape[0]
    S_total = ttt_steps * T
    emb = params["embed_tokens"][tokens].astype(cfg.dtype)
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    lay = llama.QuantLayout(sites=())
    head_w = params.get("lm_head", params["embed_tokens"])

    caches = [
        (jnp.zeros((B, S_total, nKV, hd), cfg.dtype),
         jnp.zeros((B, S_total, nKV, hd), cfg.dtype))
        for _ in range(L)
    ]
    hidden_in = base_hidden
    outs = []
    for s in range(ttt_steps):
        fused = jnp.concatenate([emb, hidden_in.astype(cfg.dtype)], axis=-1)
        x = fused @ eagle["fc"].T.astype(fused.dtype)
        mask = ttt_attention_mask(T, s, S_total)
        new_caches = []
        for li in range(L):
            lp = jax.tree.map(lambda a: a[li], eagle["layers"])
            ck, cv = caches[li]
            x, _, new_kv, _ = llama._decoder_layer(
                cfg, lay, False, x, lp, None, positions, mask, (ck, cv, s * T)
            )
            new_caches.append(new_kv)
        caches = new_caches
        pred_hidden = llama.rms_norm(x, eagle["norm"], cfg.rms_norm_eps)
        logits = (pred_hidden @ head_w.T.astype(pred_hidden.dtype)).astype(jnp.float32)
        outs.append((pred_hidden, logits))
        # next step consumes own predictions, shifted right one position
        hidden_in = jnp.roll(pred_hidden, 1, axis=1)
    return outs


def make_eagle_ttt_train_step(cfg: llama.LlamaConfig, ttt_steps: int = 3,
                              lr: float = 1e-3, reg_weight: float = 0.1):
    """Multi-step TTT objective: step s predicts token t+s+1 (CE) and the
    base hidden at t+1 on step 0 (regression), losses summed over steps."""

    def loss_fn(eagle, params, tokens):
        hidden = jax.lax.stop_gradient(_hidden_states(cfg, params, tokens))
        outs = eagle_ttt_forward(cfg, params, eagle, tokens, hidden, ttt_steps)
        total = 0.0
        accs = []
        for s, (pred_hidden, logits) in enumerate(outs):
            off = s + 1
            if tokens.shape[1] <= off:
                break
            lg = logits[:, :-off]
            tg = tokens[:, off:]
            total = total + qat_mod.cross_entropy(lg, tg)
            accs.append(jnp.mean((jnp.argmax(lg, -1) == tg).astype(jnp.float32)))
            if s == 0:
                diff = pred_hidden[:, :-1].astype(jnp.float32) - hidden[:, 1:].astype(jnp.float32)
                total = total + reg_weight * jnp.mean(
                    jnp.where(jnp.abs(diff) < 1, 0.5 * diff**2, jnp.abs(diff) - 0.5)
                )
        return total, jnp.stack(accs)

    def step(eagle, params, tokens):
        (loss, accs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            eagle, params, tokens)
        new = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), eagle, grads)
        return new, loss, accs

    return step
