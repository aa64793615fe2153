"""Minitron pruning for hybrid Mamba2/attention/MLP stacks.

Mirrors the reference's Mamba-aware Minitron
(`prune/plugins/mcore_minitron.py:22,104-106`): prunable hparams
`mamba_num_heads` (per-head activation-magnitude importance on the gated
pre-out_proj stream), `num_kv_heads`, `ffn`/`hidden` channels, and depth
(block-influence over the hybrid pattern). Head selection preserves the
B/C group structure: heads are ranked within their n_groups bucket and an
equal count is kept per group, so `n_groups` and the per-group head count
stay uniform (the reference enforces the same via `mamba_head_dim`
divisors, mcore_minitron.py:789).

One-shot functional slice like `minitron.prune`: returns
(new_cfg, new_params, plan); heal with distillation afterwards.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import mamba
from ..models.mamba import ATTN, MAMBA, MLP


@dataclasses.dataclass
class HybridImportance:
    mamba_head: Optional[np.ndarray]  # [Lm, H]
    kv_group: Optional[np.ndarray]  # [La, n_kv]
    ffn: Optional[np.ndarray]  # [Lf, I]
    hidden: np.ndarray  # [hidden]
    block: np.ndarray  # [len(pattern)] depth importance (BI)


def importance(
    cfg: mamba.MambaConfig,
    params: dict,
    batches: Iterable[jax.Array],
) -> HybridImportance:
    @jax.jit
    def cap(t):
        return mamba.forward(cfg, params, t, capture=True)[3]

    acc: dict = {}
    block_sig = None
    n = 0
    for b in batches:
        caps = cap(b)
        for k in ("mixer_out_in", "down_in", "o_in"):
            if k in caps:
                v = jnp.mean(jnp.abs(caps[k].astype(jnp.float32)), axis=1)
                acc[k] = v if k not in acc else acc[k] + v
        h = jnp.mean(jnp.abs(caps["block_in"].astype(jnp.float32)), axis=(0, 1))
        acc["hidden"] = h if "hidden" not in acc else acc["hidden"] + h
        if block_sig is None:
            block_sig = caps["block_in"].astype(jnp.float32)
        n += 1

    H, P = cfg.mamba_num_heads, cfg.mamba_head_dim
    nH, hd, nKV = cfg.num_attention_heads, cfg.hd, cfg.num_key_value_heads
    mamba_head = kv_group = ffn = None
    if "mixer_out_in" in acc:
        Lm = acc["mixer_out_in"].shape[0]
        mamba_head = np.asarray(acc["mixer_out_in"]).reshape(Lm, H, P).mean(-1) / n
    if "o_in" in acc:
        La = acc["o_in"].shape[0]
        rep = nH // nKV
        head = np.asarray(acc["o_in"]).reshape(La, nH, hd).mean(-1) / n
        kv_group = head.reshape(La, nKV, rep).mean(-1)
    if "down_in" in acc:
        ffn = np.asarray(acc["down_in"]) / n

    # Depth: 1 - cos between consecutive block inputs (Minitron BI)
    sig = np.asarray(block_sig)  # [L, n, h]
    L = sig.shape[0]
    block = np.ones(L)
    for l in range(L - 1):
        a, b_ = sig[l].ravel(), sig[l + 1].ravel()
        cos = float(np.dot(a, b_) / (np.linalg.norm(a) * np.linalg.norm(b_) + 1e-9))
        block[l] = 1.0 - cos
    block[-1] = block.max()
    return HybridImportance(
        mamba_head=mamba_head, kv_group=kv_group, ffn=ffn,
        hidden=np.asarray(acc["hidden"]) / n, block=block,
    )


@dataclasses.dataclass
class HybridPrunePlan:
    keep_mamba_heads: Optional[np.ndarray]
    keep_kv_groups: Optional[np.ndarray]
    keep_ffn: Optional[np.ndarray]
    keep_hidden: np.ndarray
    keep_blocks: np.ndarray
    new_pattern: str


def _mamba_row_index(cfg: mamba.MambaConfig, keep_heads: np.ndarray):
    """Row indices of in_proj/conv/out_proj touched by kept mamba heads."""
    P, G, N = cfg.mamba_head_dim, cfg.n_groups, cfg.ssm_state_size
    d_inner = cfg.d_inner
    head_rows = np.concatenate([np.arange(h * P, (h + 1) * P) for h in keep_heads])
    z_rows = head_rows
    x_rows = d_inner + head_rows
    b_rows = 2 * d_inner + np.arange(G * N)
    c_rows = 2 * d_inner + G * N + np.arange(G * N)
    dt_rows = 2 * d_inner + 2 * G * N + keep_heads
    in_proj_rows = np.concatenate([z_rows, x_rows, b_rows, c_rows, dt_rows])
    conv_rows = np.concatenate([head_rows, d_inner + np.arange(2 * G * N)])
    return in_proj_rows, conv_rows, head_rows


def prune(
    cfg: mamba.MambaConfig,
    params: dict,
    scores: HybridImportance,
    *,
    mamba_num_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    intermediate_size: Optional[int] = None,
    hidden_size: Optional[int] = None,
    num_blocks: Optional[int] = None,
) -> tuple[mamba.MambaConfig, dict, HybridPrunePlan]:
    H, G = cfg.mamba_num_heads, cfg.n_groups
    nH, hd, nKV = cfg.num_attention_heads, cfg.hd, cfg.num_key_value_heads
    pattern = cfg.hybrid_pattern

    tgt_Hm = mamba_num_heads or H
    tgt_kv = num_kv_heads or nKV
    tgt_I = intermediate_size or cfg.intermediate_size
    tgt_h = hidden_size or cfg.hidden_size
    tgt_L = num_blocks or len(pattern)
    assert tgt_Hm % G == 0, "kept mamba heads must stay divisible by n_groups"

    # ---- selections (global/uniform across layers, Minitron-style) ----
    keep_heads = None
    if scores.mamba_head is not None and tgt_Hm < H:
        per_group = tgt_Hm // G
        gsize = H // G
        mean_imp = scores.mamba_head.mean(0)  # [H]
        keep = []
        for g in range(G):
            grp = np.arange(g * gsize, (g + 1) * gsize)
            top = grp[np.argsort(-mean_imp[grp])[:per_group]]
            keep.append(np.sort(top))
        keep_heads = np.concatenate(keep)
    elif tgt_Hm < H:
        keep_heads = np.arange(tgt_Hm)

    keep_kv = None
    if tgt_kv < nKV:
        imp = (scores.kv_group.mean(0) if scores.kv_group is not None
               else np.arange(nKV)[::-1])
        keep_kv = np.sort(np.argsort(-imp)[:tgt_kv])

    keep_ffn = None
    if tgt_I < cfg.intermediate_size:
        imp = (scores.ffn.mean(0) if scores.ffn is not None
               else np.arange(cfg.intermediate_size)[::-1])
        keep_ffn = np.sort(np.argsort(-imp)[:tgt_I])

    keep_hid = np.sort(np.argsort(-scores.hidden)[:tgt_h])
    keep_blocks = np.sort(np.argsort(-scores.block)[:tgt_L])
    new_pattern = "".join(pattern[i] for i in keep_blocks)

    plan = HybridPrunePlan(keep_heads, keep_kv, keep_ffn, keep_hid,
                           keep_blocks, new_pattern)

    # ---- occurrence filters per block type after depth pruning ----
    def kept_occurrences(kind):
        occ, kept = 0, []
        for i, ch in enumerate(pattern):
            if ch == kind:
                if i in set(keep_blocks.tolist()):
                    kept.append(occ)
                occ += 1
        return np.asarray(kept, np.int64)

    new_params: dict = {
        "embed_tokens": params["embed_tokens"][:, keep_hid],
        "norm": params["norm"][keep_hid],
    }
    if "lm_head" in params:
        new_params["lm_head"] = params["lm_head"][:, keep_hid]

    # ---- mamba blocks ----
    if "layers_mamba" in params:
        lm = params["layers_mamba"]
        occ = jnp.asarray(kept_occurrences(MAMBA))
        kh = keep_heads if keep_heads is not None else np.arange(H)
        in_rows, conv_rows, head_rows = _mamba_row_index(cfg, kh)
        new_params["layers_mamba"] = {
            "norm": lm["norm"][occ][:, keep_hid],
            "mixer.in_proj": lm["mixer.in_proj"][occ][:, in_rows][:, :, keep_hid],
            "mixer.out_proj": lm["mixer.out_proj"][occ][:, keep_hid][:, :, head_rows],
            "mixer.conv_w": lm["mixer.conv_w"][occ][:, conv_rows],
            "mixer.conv_b": lm["mixer.conv_b"][occ][:, conv_rows],
            "mixer.A_log": lm["mixer.A_log"][occ][:, kh],
            "mixer.D": lm["mixer.D"][occ][:, kh],
            "mixer.dt_bias": lm["mixer.dt_bias"][occ][:, kh],
            "mixer.gnorm": lm["mixer.gnorm"][occ][:, head_rows],
        }

    # ---- attention blocks ----
    if "layers_attn" in params:
        la = params["layers_attn"]
        occ = jnp.asarray(kept_occurrences(ATTN))
        kv = keep_kv if keep_kv is not None else np.arange(nKV)
        rep = nH // nKV
        q_heads = np.concatenate([np.arange(g * rep, (g + 1) * rep) for g in kv])
        q_rows = np.concatenate([np.arange(h * hd, (h + 1) * hd) for h in q_heads])
        kv_rows = np.concatenate([np.arange(g * hd, (g + 1) * hd) for g in kv])
        new_params["layers_attn"] = {
            "norm": la["norm"][occ][:, keep_hid],
            "self_attn.q_proj": la["self_attn.q_proj"][occ][:, q_rows][:, :, keep_hid],
            "self_attn.k_proj": la["self_attn.k_proj"][occ][:, kv_rows][:, :, keep_hid],
            "self_attn.v_proj": la["self_attn.v_proj"][occ][:, kv_rows][:, :, keep_hid],
            "self_attn.o_proj": la["self_attn.o_proj"][occ][:, keep_hid][:, :, q_rows],
        }

    # ---- mlp blocks ----
    if "layers_mlp" in params:
        lf = params["layers_mlp"]
        occ = jnp.asarray(kept_occurrences(MLP))
        kf = keep_ffn if keep_ffn is not None else np.arange(cfg.intermediate_size)
        new_params["layers_mlp"] = {
            "norm": lf["norm"][occ][:, keep_hid],
            "mlp.up_proj": lf["mlp.up_proj"][occ][:, kf][:, :, keep_hid],
            "mlp.down_proj": lf["mlp.down_proj"][occ][:, keep_hid][:, :, kf],
        }
    # drop empty groups if depth pruning removed a whole type
    for key, kind in (("layers_mamba", MAMBA), ("layers_attn", ATTN),
                      ("layers_mlp", MLP)):
        if key in new_params and kind not in new_pattern:
            del new_params[key]

    rep = nH // nKV
    new_cfg = dataclasses.replace(
        cfg,
        hybrid_pattern=new_pattern,
        mamba_num_heads=tgt_Hm,
        num_key_value_heads=tgt_kv,
        num_attention_heads=tgt_kv * rep,
        head_dim=hd,
        intermediate_size=tgt_I,
        hidden_size=tgt_h,
    )
    return new_cfg, new_params, plan
