"""DFlash: block-wise parallel speculative decoding.

Re-creates the reference's dflash mode (`speculative/dflash/dflash_model.py`,
`speculative/mode.py:91`): a draft module predicts a BLOCK of future tokens
in parallel from the base model's hidden state — one module with per-offset
query embeddings rather than medusa's separate heads. Training uses a
position-decayed objective (`dflash_loss_decay_factor`: later offsets are
harder, weighted gamma^i) with optional self-logit distillation
(`dflash_self_logit_distillation`: soft targets from the base model's own
logits instead of hard labels).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import llama
from .medusa import _hidden_states


@dataclasses.dataclass(frozen=True)
class DFlashConfig:
    block_size: int = 4  # tokens drafted in parallel per step
    loss_decay_factor: float = 0.8  # gamma^i weighting per offset
    self_logit_distillation: bool = True
    hidden_mult: int = 2  # draft MLP expansion


def init_dflash(cfg: llama.LlamaConfig, dcfg: DFlashConfig, key: jax.Array) -> dict:
    h = cfg.hidden_size
    m = h * dcfg.hidden_mult
    keys = jax.random.split(key, 4)
    return {
        # per-offset query embeddings concatenated with the hidden state
        "offset_emb": (jax.random.normal(keys[0], (dcfg.block_size, h), jnp.float32) * 0.02).astype(cfg.dtype),
        "fc1": (jax.random.normal(keys[1], (m, 2 * h), jnp.float32) / math.sqrt(2 * h)).astype(cfg.dtype),
        "fc2": (jax.random.normal(keys[2], (h, m), jnp.float32) / math.sqrt(m)).astype(cfg.dtype),
    }


def dflash_logits(cfg, params, dflash, tokens):
    """Block predictions at every position.

    Returns (base_logits [B,T,V], block_logits [block, B, T, V]): block i
    predicts token t+1+i from hidden_t.
    """
    hidden = _hidden_states(cfg, params, tokens)
    head_w = params.get("lm_head", params["embed_tokens"])
    base_logits = (hidden @ head_w.T.astype(hidden.dtype)).astype(jnp.float32)
    outs = []
    for i in range(dflash["offset_emb"].shape[0]):
        q = jnp.broadcast_to(
            dflash["offset_emb"][i], hidden.shape[:-1] + (hidden.shape[-1],)
        )
        z = jnp.concatenate([hidden, q.astype(hidden.dtype)], axis=-1)
        z = jax.nn.silu((z @ dflash["fc1"].T.astype(z.dtype)).astype(jnp.float32)).astype(hidden.dtype)
        z = hidden + (z @ dflash["fc2"].T.astype(z.dtype))
        outs.append((z @ head_w.T.astype(z.dtype)).astype(jnp.float32))
    return base_logits, jnp.stack(outs)


def make_dflash_train_step(cfg: llama.LlamaConfig, dcfg: DFlashConfig, lr: float = 1e-3):
    """Train the draft block predictor (base model frozen)."""

    def loss_fn(dflash, params, tokens):
        base_logits, blk = dflash_logits(cfg, params, dflash, tokens)
        base_logits = jax.lax.stop_gradient(base_logits)
        total, wsum = 0.0, 0.0
        T = tokens.shape[1]
        for i in range(dcfg.block_size):
            off = i + 1
            if T <= off:
                continue
            logits_i = blk[i][:, :-off]
            w = dcfg.loss_decay_factor ** i
            if dcfg.self_logit_distillation:
                # soft target: the base model's own prediction at t+off
                tgt = jax.nn.softmax(base_logits[:, off:], axis=-1)
                lp = jax.nn.log_softmax(logits_i, axis=-1)
                total += w * (-jnp.mean(jnp.sum(tgt * lp, axis=-1)))
            else:
                tgt_tok = tokens[:, off:]
                lp = jax.nn.log_softmax(logits_i, axis=-1)
                ll = jnp.take_along_axis(lp, tgt_tok[..., None], axis=-1)[..., 0]
                total += w * (-jnp.mean(ll))
            wsum += w
        return total / max(wsum, 1e-9)

    def step(dflash, params, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(dflash, params, tokens)
        new = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), dflash, grads)
        return new, loss

    return step


def propose_and_verify(cfg, params, dflash, prompt, steps=16):
    """Greedy block-parallel decode + acceptance rate (specdec_bench style)."""
    assert prompt.shape[0] == 1
    block = dflash["offset_emb"].shape[0]
    tokens = prompt
    accepted_total = proposed_total = produced = 0
    while produced < steps:
        base_logits, blk = dflash_logits(cfg, params, dflash, tokens)
        nxt = jnp.argmax(base_logits[:, -1], axis=-1)
        draft = [int(jnp.argmax(blk[i][:, -1], axis=-1)[0]) for i in range(block)]
        chain = jnp.concatenate(
            [tokens, nxt[:, None], jnp.asarray([draft], jnp.int32)], axis=1
        )
        ver, _, _ = llama.forward(cfg, params, chain)
        n_acc = 0
        for i in range(block):
            pos = tokens.shape[1] + i
            if int(jnp.argmax(ver[0, pos])) == draft[i]:
                n_acc += 1
            else:
                break
        keep = [int(nxt[0])] + draft[:n_acc]
        tokens = jnp.concatenate([tokens, jnp.asarray([keep], jnp.int32)], axis=1)
        produced += len(keep)
        accepted_total += n_acc
        proposed_total += block
    return tokens, accepted_total / max(proposed_total, 1)
