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


# --------------------------------------------------------------------------
# EAGLE-3: multi-layer auxiliary feature taps
# --------------------------------------------------------------------------


def default_aux_layer_ids(num_layers: int) -> list[int]:
    """Default EAGLE-3 tap layers: near start / middle / end of the stack
    (reference `hf_eagle.py:58` `default_eagle_aux_layer_ids`)."""
    return sorted({1, max(0, num_layers // 2 - 1), max(0, num_layers - 4)})


def aux_hidden_states(cfg, params, tokens, layer_ids, layout=None, qstate=None):
    """Base forward capturing the PRE-norm hidden state after each tapped
    layer (reference collects the decoder-layer outputs via forward hooks,
    `hf_eagle.py:208`). Returns [B, T, len(layer_ids)*H], low-to-high."""
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
        return x, x  # emit every layer's output; taps indexed after the scan

    _, all_h = jax.lax.scan(body, x, (params["layers"], lstate))
    taps = [all_h[i] for i in layer_ids]  # each [B, T, H]
    return jnp.concatenate(taps, axis=-1)


def init_eagle3(cfg: llama.LlamaConfig, ecfg: EagleConfig, key: jax.Array,
                layer_ids: Optional[list] = None) -> dict:
    """EAGLE-3 draft: an EAGLE-1 module plus an aux-feature fusion projection
    fc3 [H, k*H] mapping the concatenated tapped hiddens into the draft's
    hidden input (reference `hf_eagle.py:231,491`: `self.eagle_module.fc`
    over `aux_hiddens`)."""
    h = cfg.hidden_size
    layer_ids = layer_ids or default_aux_layer_ids(cfg.num_hidden_layers)
    base = init_eagle(cfg, ecfg, key)
    k = len(layer_ids)
    base["fc3"] = (
        jax.random.normal(jax.random.fold_in(key, 7), (h, k * h), jnp.float32)
        / math.sqrt(k * h)
    ).astype(cfg.dtype)
    base["aux_layer_ids"] = tuple(layer_ids)
    return base


def eagle3_fuse(eagle: dict, aux: jax.Array) -> jax.Array:
    """[B, T, k*H] tapped features -> [B, T, H] draft input."""
    return aux @ eagle["fc3"].T.astype(aux.dtype)


def make_eagle3_ttt_train_step(cfg: llama.LlamaConfig, ttt_steps: int = 3,
                               lr: float = 1e-3):
    """EAGLE-3 TTT training: step 0 consumes the fused multi-layer features,
    later steps recurse on the draft's own hiddens (same TTT mask/objective
    as EAGLE-1 TTT; no hidden-regression term — EAGLE-3 drops it since the
    fused feature space no longer matches the base hidden space)."""

    def loss_fn(eagle, params, tokens):
        layer_ids = list(eagle["aux_layer_ids"])
        aux = jax.lax.stop_gradient(
            aux_hidden_states(cfg, params, tokens, layer_ids)
        )
        fused = eagle3_fuse(eagle, aux)
        outs = eagle_ttt_forward(cfg, params, eagle, tokens, fused, ttt_steps)
        total = 0.0
        accs = []
        for s, (_, logits) in enumerate(outs):
            off = s + 1
            if tokens.shape[1] <= off:
                break
            lg = logits[:, :-off]
            tg = tokens[:, off:]
            total = total + qat_mod.cross_entropy(lg, tg)
            accs.append(jnp.mean((jnp.argmax(lg, -1) == tg).astype(jnp.float32)))
        return total, jnp.stack(accs)

    def step(eagle, params, tokens):
        grad_keys = [k for k in eagle if k != "aux_layer_ids"]
        def wrapped(trainable):
            return loss_fn({**eagle, **trainable}, params, tokens)
        trainable = {k: eagle[k] for k in grad_keys}
        (loss, accs), grads = jax.value_and_grad(wrapped, has_aux=True)(trainable)
        new = {**eagle, **jax.tree.map(
            lambda p, g: p - lr * g.astype(p.dtype), trainable, grads)}
        return new, loss, accs

    return step


def propose_and_verify(cfg, params, eagle, prompt, steps=16, draft_len=3,
                       layout=None, qstate=None):
    """Greedy EAGLE decoding + acceptance stats (specdec_bench analog).

    Each iteration: the draft proposes `draft_len` tokens autoregressively
    from the base hidden (EAGLE-1) or fused aux features (EAGLE-3, detected
    by the `fc3` key); one base forward verifies the chain; accept the
    longest matching prefix + bonus. Returns (tokens, accept_rate)."""
    B = prompt.shape[0]
    assert B == 1, "acceptance harness is single-sequence"
    is_e3 = "fc3" in eagle
    tokens = prompt
    accepted_total = proposed_total = produced = 0
    while produced < steps:
        # verified next token from one base forward
        full_logits, _, _ = llama.forward(
            cfg, params, tokens, layout=layout, qstate=qstate
        )
        nxt = int(jnp.argmax(full_logits[0, -1]))
        cur_tokens = jnp.concatenate(
            [tokens, jnp.asarray([[nxt]], jnp.int32)], axis=1
        )
        # True base hiddens for the whole context INCLUDING the bonus
        # token's slot: in a production pipeline these all come from the
        # previous round's verify forward (nxt was a chain input there), so
        # the draft's FIRST step runs on exact features — only steps >= 2
        # recurse on the draft's own predicted hiddens (the TTT objective).
        # Round-2's harness fed a predicted hidden to step 1 too, which
        # understated acceptance ~10x.
        if is_e3:
            aux = aux_hidden_states(
                cfg, params, cur_tokens, list(eagle["aux_layer_ids"]), layout, qstate
            )
            cur_hidden = eagle3_fuse(eagle, aux)
        else:
            cur_hidden = _hidden_states(cfg, params, cur_tokens, layout, qstate)
        draft = []
        for _ in range(draft_len):
            ph, dlogits = eagle_forward(cfg, params, eagle, cur_tokens, cur_hidden)
            d = int(jnp.argmax(dlogits[0, -1]))
            draft.append(d)
            cur_tokens = jnp.concatenate(
                [cur_tokens, jnp.asarray([[d]], jnp.int32)], axis=1
            )
            cur_hidden = jnp.concatenate([cur_hidden, ph[:, -1:]], axis=1)
        # verify with one base forward over tokens + [nxt] + draft
        chain = jnp.concatenate(
            [tokens, jnp.asarray([[nxt] + draft], jnp.int32)], axis=1
        )
        ver_logits, _, _ = llama.forward(
            cfg, params, chain, layout=layout, qstate=qstate
        )
        n_acc = 0
        for i, d in enumerate(draft):
            pos = tokens.shape[1] + i
            if int(jnp.argmax(ver_logits[0, pos])) == d:
                n_acc += 1
            else:
                break
        keep = [nxt] + draft[:n_acc]
        tokens = jnp.concatenate([tokens, jnp.asarray([keep], jnp.int32)], axis=1)
        produced += len(keep)
        accepted_total += n_acc
        proposed_total += draft_len
    return tokens, accepted_total / max(proposed_total, 1)
