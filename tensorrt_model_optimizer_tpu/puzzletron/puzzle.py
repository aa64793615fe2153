"""Puzzletron-lite: heterogeneous block-substitution NAS.

A compact, faithful re-creation of the reference's puzzletron pipeline
(`modelopt/torch/puzzletron`: replacement_library -> subblock_stats -> MIP ->
sewing_kit): per decoder layer, build a library of replacement candidates
(full / ffn-pruned / kv-pruned / no-op), score each candidate LOCALLY (output
MSE against the full layer on that layer's true input activations, obtained
by layerwise propagation), solve a one-hot MIP for the best per-layer choice
under a parameter budget, and stitch the heterogeneous result into a
runnable model (per-layer configs + params; hidden size fixed so the
residual stream stitches).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..prune import minitron


@dataclasses.dataclass
class Candidate:
    name: str
    cfg: Optional[llama.LlamaConfig]  # None = no-op (skip layer)
    params: Optional[dict]  # per-layer params
    cost: int  # parameter count
    score: float = 0.0  # local output MSE (filled by scoring)


@dataclasses.dataclass
class PuzzleResult:
    choices: list[str]  # candidate name per layer
    layers: list[Candidate]
    total_params: int
    full_params: int


def _layer_param_count(cfg: llama.LlamaConfig) -> int:
    sh = llama._layer_shapes(cfg)
    return sum(o * i for o, i in sh.values()) + 2 * cfg.hidden_size


def _slice_layer_candidate(cfg, lp, scores_l, kind: str):
    """Build one pruned per-layer variant using importance scores."""
    nH, nKV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    I = cfg.intermediate_size
    if kind == "full":
        return dataclasses.replace(cfg), dict(lp)
    if kind == "ffn50":
        keep = np.sort(np.argsort(-scores_l.ffn)[: I // 2])
        new = dict(lp)
        new["mlp.gate_proj"] = lp["mlp.gate_proj"][keep]
        new["mlp.up_proj"] = lp["mlp.up_proj"][keep]
        new["mlp.down_proj"] = lp["mlp.down_proj"][:, keep]
        return dataclasses.replace(cfg, intermediate_size=I // 2), new
    if kind == "kv50" and nKV >= 2:
        rep = nH // nKV
        keep_kv = np.sort(np.argsort(-scores_l.kv)[: nKV // 2])
        q_heads = np.concatenate([np.arange(g * rep, (g + 1) * rep) for g in keep_kv])
        q_rows = np.concatenate([np.arange(h * hd, (h + 1) * hd) for h in q_heads])
        kv_rows = np.concatenate([np.arange(g * hd, (g + 1) * hd) for g in keep_kv])
        new = dict(lp)
        new["self_attn.q_proj"] = lp["self_attn.q_proj"][q_rows]
        new["self_attn.k_proj"] = lp["self_attn.k_proj"][kv_rows]
        new["self_attn.v_proj"] = lp["self_attn.v_proj"][kv_rows]
        new["self_attn.o_proj"] = lp["self_attn.o_proj"][:, q_rows]
        return dataclasses.replace(
            cfg, num_key_value_heads=nKV // 2,
            num_attention_heads=(nKV // 2) * rep,
            head_dim=hd,  # head size is preserved; hd must not re-derive
        ), new
    return None, None


@dataclasses.dataclass
class _LayerScores:
    ffn: np.ndarray
    kv: np.ndarray


def build_and_score_library(
    cfg: llama.LlamaConfig,
    params: llama.Params,
    batches: list[jax.Array],
    kinds=("full", "ffn50", "kv50", "noop"),
) -> list[list[Candidate]]:
    """Per layer: candidates with local-output-MSE scores.

    Layer inputs come from layerwise propagation of the FULL model, so each
    candidate is judged on the distribution it would actually see.
    """
    imp = minitron.importance(cfg, params, batches, capture_tokens=64)
    L = cfg.num_hidden_layers
    tokens = batches[0]
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )[None, None, :, :].astype(jnp.float32)
    lay = llama.QuantLayout(sites=())

    x = jax.jit(lambda t: params["embed_tokens"][t].astype(cfg.dtype))(tokens)
    library: list[list[Candidate]] = []
    for i in range(L):
        lp = llama.slice_layer(params["layers"], i)
        full_out, _, _, _ = llama._decoder_layer(
            cfg, lay, False, x, lp, None, positions, mask, None
        )
        cands: list[Candidate] = []
        sc = _LayerScores(ffn=imp.ffn[i], kv=imp.kv_group[i])
        for kind in kinds:
            if kind == "noop":
                err = float(jnp.mean((full_out - x) ** 2))
                cands.append(Candidate("noop", None, None, cost=0, score=err))
                continue
            ccfg, cp = _slice_layer_candidate(cfg, lp, sc, kind)
            if ccfg is None:
                continue
            out, _, _, _ = llama._decoder_layer(
                ccfg, lay, False, x, cp, None, positions, mask, None
            )
            err = float(jnp.mean((full_out - out) ** 2))
            cands.append(
                Candidate(kind, ccfg, cp, cost=_layer_param_count(ccfg), score=err)
            )
        library.append(cands)
        x = full_out  # propagate the FULL model's activations
    return library


def run_puzzle(
    library: list[list[Candidate]],
    param_budget_ratio: float = 0.75,
) -> PuzzleResult:
    """One-hot MIP: min Σ score s.t. Σ cost <= ratio * full params."""
    from ..quant.auto import _solve_ilp

    L = len(library)
    ncand = max(len(c) for c in library)
    scores = np.full((L, ncand), 1e9)
    costs = np.zeros((L, ncand))
    for i, cands in enumerate(library):
        for j, c in enumerate(cands):
            scores[i, j] = c.score
            costs[i, j] = c.cost
    full = sum(c.cost for cands in library for c in cands if c.name == "full")
    pick = _solve_ilp(scores, costs, budget=param_budget_ratio * full)
    chosen = [library[i][int(pick[i])] for i in range(L)]
    return PuzzleResult(
        choices=[c.name for c in chosen],
        layers=chosen,
        total_params=int(sum(c.cost for c in chosen)),
        full_params=int(full),
    )


def forward_hetero(
    base_cfg: llama.LlamaConfig,
    params: llama.Params,
    result: PuzzleResult,
    tokens: jax.Array,
):
    """Run the stitched heterogeneous model (the sewing kit)."""
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )[None, None, :, :].astype(jnp.float32)
    lay = llama.QuantLayout(sites=())
    x = params["embed_tokens"][tokens].astype(base_cfg.dtype)
    for cand in result.layers:
        if cand.name == "noop":
            continue
        x, _, _, _ = llama._decoder_layer(
            cand.cfg, lay, False, x, cand.params, None, positions, mask, None
        )
    x = llama.rms_norm(x, params["norm"], base_cfg.rms_norm_eps)
    head_w = params.get("lm_head", params["embed_tokens"])
    return (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
