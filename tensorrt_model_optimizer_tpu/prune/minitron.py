"""Minitron-style structured pruning (width + depth) for Llama models.

Re-creates `modelopt/torch/prune/plugins/mcore_minitron.py` +
`prune/importance_hooks/`: activation-magnitude importance for attention
KV-head groups, FFN channels, hidden channels, and layer depth; then a
one-shot slice of params into a smaller architecture (to be healed by
distillation, `examples/pruning` flow).

Functional: importance comes from one captured forward (no hooks);
`prune()` returns (new_config, new_params, plan) with deterministic
index selections recorded in the plan for reproducibility.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama


@dataclasses.dataclass
class ImportanceScores:
    kv_group: np.ndarray  # [L, n_kv] attention KV-group importance
    ffn: np.ndarray  # [L, I] FFN channel importance
    hidden: np.ndarray  # [H] hidden channel importance
    layer: np.ndarray  # [L] depth importance


def importance(
    cfg: llama.LlamaConfig,
    params: llama.Params,
    batches: Iterable[jax.Array],
    capture_tokens: int = 128,
) -> ImportanceScores:
    """Activation-magnitude importance from captured forwards."""
    layout = llama.QuantLayout(sites=())

    @jax.jit
    def cap(t):
        _, _, _, caps = llama.forward(
            cfg, params, t, layout=layout, calib=True, capture_tokens=capture_tokens
        )
        return caps

    o_acc = None  # [L, nH*hd] attention-context magnitude
    ffn_acc = None  # [L, I]
    hid_acc = None  # [H]
    layer_sig = None  # [L, n, H] attn_in sample for depth score
    n = 0
    for b in batches:
        caps = cap(b)
        o = jnp.mean(jnp.abs(caps["o_in"].astype(jnp.float32)), axis=1)
        f = jnp.mean(jnp.abs(caps["down_in"].astype(jnp.float32)), axis=1)
        h = jnp.mean(jnp.abs(caps["attn_in"].astype(jnp.float32)), axis=(0, 1))
        o_acc = o if o_acc is None else o_acc + o
        ffn_acc = f if ffn_acc is None else ffn_acc + f
        hid_acc = h if hid_acc is None else hid_acc + h
        if layer_sig is None:
            layer_sig = caps["attn_in"].astype(jnp.float32)
        n += 1

    nH, hd, nKV = cfg.num_attention_heads, cfg.hd, cfg.num_key_value_heads
    rep = nH // nKV
    head_imp = np.asarray(o_acc).reshape(cfg.num_hidden_layers, nH, hd).mean(-1) / n
    kv_imp = head_imp.reshape(cfg.num_hidden_layers, nKV, rep).mean(-1)

    # Depth: layers whose block changes the hidden stream least matter least
    # (cosine between consecutive attn_in signatures, Minitron BI score).
    sig = np.asarray(layer_sig)  # [L, n, H]
    L = sig.shape[0]
    layer_imp = np.ones(L)
    for l in range(L - 1):
        a, b_ = sig[l].ravel(), sig[l + 1].ravel()
        cos = float(np.dot(a, b_) / (np.linalg.norm(a) * np.linalg.norm(b_) + 1e-9))
        layer_imp[l] = 1.0 - cos
    layer_imp[-1] = layer_imp.max()  # keep the final layer

    return ImportanceScores(
        kv_group=kv_imp,
        ffn=np.asarray(ffn_acc) / n,
        hidden=np.asarray(hid_acc) / n,
        layer=layer_imp,
    )


@dataclasses.dataclass
class PrunePlan:
    keep_kv_groups: np.ndarray  # [n_kv_new] (uniform across layers)
    keep_ffn: np.ndarray  # [I_new]
    keep_hidden: np.ndarray  # [H_new]
    keep_layers: np.ndarray  # [L_new]


def prune(
    cfg: llama.LlamaConfig,
    params: llama.Params,
    scores: ImportanceScores,
    *,
    num_kv_heads: Optional[int] = None,
    intermediate_size: Optional[int] = None,
    hidden_size: Optional[int] = None,
    num_layers: Optional[int] = None,
) -> tuple[llama.LlamaConfig, llama.Params, PrunePlan]:
    """Slice the model to the target widths/depth (uniform across layers,
    like Minitron: per-layer ranks averaged into one global selection)."""
    nH, hd, nKV = cfg.num_attention_heads, cfg.hd, cfg.num_key_value_heads
    rep = nH // nKV
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers

    tgt_kv = num_kv_heads or nKV
    tgt_I = intermediate_size or I
    tgt_H = hidden_size or H
    tgt_L = num_layers or L

    keep_kv = np.sort(np.argsort(-scores.kv_group.mean(0))[:tgt_kv])
    keep_ffn = np.sort(np.argsort(-scores.ffn.mean(0))[:tgt_I])
    keep_hid = np.sort(np.argsort(-scores.hidden)[:tgt_H])
    keep_lay = np.sort(np.argsort(-scores.layer)[:tgt_L])
    plan = PrunePlan(keep_kv, keep_ffn, keep_hid, keep_lay)

    # head index expansion: kv group g covers q heads [g*rep, (g+1)*rep)
    q_heads = np.concatenate([np.arange(g * rep, (g + 1) * rep) for g in keep_kv])
    q_rows = np.concatenate([np.arange(h * hd, (h + 1) * hd) for h in q_heads])
    kv_rows = np.concatenate([np.arange(g * hd, (g + 1) * hd) for g in keep_kv])

    lay = params["layers"]
    kl = jnp.asarray(keep_lay)
    sel = lambda a: a[kl]
    new_layers = {
        "input_layernorm": sel(lay["input_layernorm"])[:, keep_hid],
        "post_attention_layernorm": sel(lay["post_attention_layernorm"])[:, keep_hid],
        "self_attn.q_proj": sel(lay["self_attn.q_proj"])[:, q_rows][:, :, keep_hid],
        "self_attn.k_proj": sel(lay["self_attn.k_proj"])[:, kv_rows][:, :, keep_hid],
        "self_attn.v_proj": sel(lay["self_attn.v_proj"])[:, kv_rows][:, :, keep_hid],
        "self_attn.o_proj": sel(lay["self_attn.o_proj"])[:, keep_hid][:, :, q_rows],
        "mlp.gate_proj": sel(lay["mlp.gate_proj"])[:, keep_ffn][:, :, keep_hid],
        "mlp.up_proj": sel(lay["mlp.up_proj"])[:, keep_ffn][:, :, keep_hid],
        "mlp.down_proj": sel(lay["mlp.down_proj"])[:, keep_hid][:, :, keep_ffn],
    }
    new_params: llama.Params = {
        "embed_tokens": params["embed_tokens"][:, keep_hid],
        "layers": new_layers,
        "norm": params["norm"][keep_hid],
    }
    if "lm_head" in params:
        new_params["lm_head"] = params["lm_head"][:, keep_hid]

    new_cfg = dataclasses.replace(
        cfg,
        num_hidden_layers=tgt_L,
        num_key_value_heads=tgt_kv,
        num_attention_heads=tgt_kv * rep,
        intermediate_size=tgt_I,
        hidden_size=tgt_H,
        head_dim=hd,  # head_dim preserved under hidden pruning
    )
    return new_cfg, new_params, plan
