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
    skip: Optional[str] = None  # "attn" | "mlp" | "mamba" — sub-block swap
    # alternative-architecture replacement (reference anymodel: swap the
    # attention op for a mamba mixer, locally distilled): the MambaConfig
    # governing this candidate's "mixer.*" params
    mamba_cfg: Optional[object] = None


@dataclasses.dataclass
class PuzzleResult:
    choices: list[str]  # candidate name per layer
    layers: list[Candidate]
    total_params: int
    full_params: int


def _layer_param_count(cfg: llama.LlamaConfig) -> int:
    sh = llama._layer_shapes(cfg)
    return sum(o * i for o, i in sh.values()) + 2 * cfg.hidden_size


def _prune_ffn(cfg, lp, scores_l, pct: int):
    I = cfg.intermediate_size
    w = max(int(I * pct / 100) // 8 * 8, 8)
    keep = np.sort(np.argsort(-scores_l.ffn)[:w])
    new = dict(lp)
    new["mlp.gate_proj"] = lp["mlp.gate_proj"][keep]
    new["mlp.up_proj"] = lp["mlp.up_proj"][keep]
    new["mlp.down_proj"] = lp["mlp.down_proj"][:, keep]
    return dataclasses.replace(cfg, intermediate_size=w), new


def _prune_kv(cfg, lp, scores_l, pct: int):
    nH, nKV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    n_keep = max(int(nKV * pct / 100), 1)
    if n_keep >= nKV:
        return None, None
    rep = nH // nKV
    keep_kv = np.sort(np.argsort(-scores_l.kv)[:n_keep])
    q_heads = np.concatenate([np.arange(g * rep, (g + 1) * rep) for g in keep_kv])
    q_rows = np.concatenate([np.arange(h * hd, (h + 1) * hd) for h in q_heads])
    kv_rows = np.concatenate([np.arange(g * hd, (g + 1) * hd) for g in keep_kv])
    new = dict(lp)
    new["self_attn.q_proj"] = lp["self_attn.q_proj"][q_rows]
    new["self_attn.k_proj"] = lp["self_attn.k_proj"][kv_rows]
    new["self_attn.v_proj"] = lp["self_attn.v_proj"][kv_rows]
    new["self_attn.o_proj"] = lp["self_attn.o_proj"][:, q_rows]
    return dataclasses.replace(
        cfg, num_key_value_heads=n_keep,
        num_attention_heads=n_keep * rep,
        head_dim=hd,  # head size is preserved; hd must not re-derive
    ), new


def _slice_layer_candidate(cfg, lp, scores_l, kind: str):
    """Build one pruned per-layer variant using importance scores.

    Kind grammar (the replacement-library breadth of the reference's
    puzzletron `replacement_library`): "full", "ffn<pct>", "kv<pct>",
    combos "ffn<pct>+kv<pct>", and sub-block removals "attn_skip" /
    "mlp_skip" (handled by the caller via Candidate.skip)."""
    if kind == "full":
        return dataclasses.replace(cfg), dict(lp)
    ccfg, cp = dataclasses.replace(cfg), dict(lp)
    for part in kind.split("+"):
        if part.startswith("ffn"):
            ccfg, cp = _prune_ffn(ccfg, cp, scores_l, int(part[3:]))
        elif part.startswith("kv"):
            r = _prune_kv(ccfg, cp, scores_l, int(part[2:]))
            if r[0] is None:
                return None, None
            ccfg, cp = r
        else:
            return None, None
    return ccfg, cp


def _attn_params(cfg) -> int:
    sh = llama._layer_shapes(cfg)
    return sum(o * i for n, (o, i) in sh.items() if n.startswith("self_attn"))


def _layer_out(ccfg, x, cp, positions, mask, skip: Optional[str] = None,
               mamba_cfg=None):
    """One layer with optional attention/MLP removal or an attention->mamba
    swap (sewing-kit variants; `mamba_cfg` is STATIC — params stay a pure
    array pytree so healing can jit over them)."""
    lay = llama.QuantLayout(sites=())
    if skip is None:
        out, _, _, _ = llama._decoder_layer(
            ccfg, lay, False, x, cp, None, positions, mask, None
        )
        return out
    if skip == "attn":
        h = llama.rms_norm(x, cp["post_attention_layernorm"], ccfg.rms_norm_eps)
        mlp_out, _, _ = llama._mlp(h, cp, None, lay, False)
        return x + mlp_out
    if skip == "mlp":
        h = llama.rms_norm(x, cp["input_layernorm"], ccfg.rms_norm_eps)
        attn, _, _, _ = llama._attention(
            ccfg, h, cp, None, lay, positions, mask, None, False
        )
        return x + attn
    if skip == "mamba":
        # attention op replaced by a mamba2 mixer (reference anymodel swap)
        from ..models import mamba as mamba_mod

        mcfg = mamba_cfg
        h = llama.rms_norm(x, cp["input_layernorm"], ccfg.rms_norm_eps)
        y, _, _, _ = mamba_mod._mixer(mcfg, h, cp, None, lay, None, False)
        x = x + y
        h = llama.rms_norm(x, cp["post_attention_layernorm"], ccfg.rms_norm_eps)
        mlp_out, _, _ = llama._mlp(h, cp, None, lay, False)
        return x + mlp_out
    raise ValueError(skip)


@dataclasses.dataclass
class _LayerScores:
    ffn: np.ndarray
    kv: np.ndarray


def build_and_score_library(
    cfg: llama.LlamaConfig,
    params: llama.Params,
    batches: list[jax.Array],
    kinds=("full", "ffn75", "ffn50", "ffn25", "kv50", "kv25",
           "ffn50+kv50", "attn_skip", "mlp_skip", "noop"),
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
            if kind == "attn2mamba":
                cand = build_mamba_candidate(
                    cfg, lp, x, full_out, positions, mask, seed=i)
                if cand is not None:
                    cands.append(cand)
                continue
            if kind in ("attn_skip", "mlp_skip"):
                skip = kind.split("_")[0]
                out = _layer_out(cfg, x, lp, positions, mask, skip)
                cost = _layer_param_count(cfg) - (
                    _attn_params(cfg) if skip == "attn"
                    else _layer_param_count(cfg) - _attn_params(cfg) - 2 * cfg.hidden_size
                )
                err = float(jnp.mean((full_out - out) ** 2))
                cands.append(Candidate(kind, dataclasses.replace(cfg), dict(lp),
                                       cost=cost, score=err, skip=skip))
                continue
            ccfg, cp = _slice_layer_candidate(cfg, lp, sc, kind)
            if ccfg is None:
                continue
            out = _layer_out(ccfg, x, cp, positions, mask)
            err = float(jnp.mean((full_out - out) ** 2))
            cands.append(
                Candidate(kind, ccfg, cp, cost=_layer_param_count(ccfg), score=err)
            )
        library.append(cands)
        x = full_out  # propagate the FULL model's activations
    return library


def build_mamba_candidate(
    cfg: llama.LlamaConfig,
    lp: dict,
    x: jax.Array,
    full_out: jax.Array,
    positions,
    mask,
    distill_steps: int = 120,
    lr: float = 3e-3,
    seed: int = 0,
):
    """Alternative-architecture replacement block (reference puzzletron
    `anymodel/`: attention <-> mamba swaps): replace the layer's attention
    op with a fresh Mamba2 mixer and LOCALLY DISTILL it — train the mixer
    (plus this layer's norms) to match the FULL layer's output on the
    layer's true input activations, exactly the reference's
    replacement-library build (train candidates against the parent, then
    let the MIP judge them by local score).

    Returns a Candidate (skip="mamba") or None if the geometry doesn't fit.
    """
    import optax

    from ..models import mamba as mamba_mod

    h = cfg.hidden_size
    heads = max(h // 64, 1)
    try:
        mcfg = mamba_mod.MambaConfig(
            vocab_size=cfg.vocab_size, hidden_size=h,
            intermediate_size=cfg.intermediate_size,
            num_attention_heads=cfg.num_attention_heads,
            num_key_value_heads=cfg.num_key_value_heads,
            mamba_num_heads=heads, mamba_head_dim=max(2 * h // heads, 8),
            ssm_state_size=min(64, h), n_groups=1, chunk_size=8,
            hybrid_pattern="M", dtype=cfg.dtype,
        )
        mp = mamba_mod.init_params(mcfg, jax.random.key(seed))
    except Exception:
        return None
    mixer = {k: v[0] for k, v in mp["layers_mamba"].items()
             if k.startswith("mixer.")}
    cand_params = {k: v for k, v in lp.items()
                   if not k.startswith("self_attn.")}
    cand_params.update(mixer)

    train_keys = tuple(mixer) + ("input_layernorm", "post_attention_layernorm")

    def fwd(trained, frozen):
        cp = {**frozen, **trained}
        return _layer_out(cfg, x, cp, positions, mask, "mamba",
                          mamba_cfg=mcfg)

    frozen = {k: v for k, v in cand_params.items() if k not in train_keys}
    trained = {k: cand_params[k] for k in train_keys if k in cand_params}
    opt = optax.adam(lr)
    ost = opt.init(trained)

    @jax.jit
    def step(trained, ost):
        def loss_fn(tr):
            out = fwd(tr, frozen)
            return jnp.mean((out.astype(jnp.float32)
                             - full_out.astype(jnp.float32)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(trained)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(trained, up), ost, loss

    loss = None
    for _ in range(distill_steps):
        trained, ost, loss = step(trained, ost)
    cand_params.update(trained)
    out = _layer_out(cfg, x, cand_params, positions, mask, "mamba",
                     mamba_cfg=mcfg)
    err = float(jnp.mean((full_out.astype(jnp.float32)
                          - out.astype(jnp.float32)) ** 2))
    mixer_params = int(sum(v.size for k, v in cand_params.items()
                           if k.startswith("mixer.")))
    cost = _layer_param_count(cfg) - _attn_params(cfg) + mixer_params
    return Candidate("attn2mamba", dataclasses.replace(cfg), cand_params,
                     cost=cost, score=err, skip="mamba", mamba_cfg=mcfg)


def heal_child(
    base_cfg: llama.LlamaConfig,
    params: llama.Params,
    result: PuzzleResult,
    batches: list[jax.Array],
    steps: int = 100,
    lr: float = 1e-4,
    temperature: float = 2.0,
):
    """Post-stitch healing (reference puzzletron post-stitch distillation):
    short knowledge-distillation fine-tune of the stitched child against
    the PARENT's logits on the calibration stream. Only the chosen
    candidate layers train (embed/head/norm stay the parent's). Returns
    (healed PuzzleResult, {"kd_loss_first", "kd_loss_last"})."""
    import optax

    statics = [(c.name, c.cfg, c.skip, c.mamba_cfg) for c in result.layers]
    child_layers = [dict(c.params) if c.params is not None else {}
                    for c in result.layers]

    def child_logits(layers_list, tokens):
        B, T = tokens.shape
        positions = jnp.broadcast_to(
            jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
        mask = jnp.where(
            jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
        )[None, None, :, :].astype(jnp.float32)
        x = params["embed_tokens"][tokens].astype(base_cfg.dtype)
        for (name, ccfg, skip, mcfg), cp in zip(statics, layers_list):
            if name == "noop":
                continue
            x = _layer_out(ccfg, x, cp, positions, mask, skip,
                           mamba_cfg=mcfg)
        x = llama.rms_norm(x, params["norm"], base_cfg.rms_norm_eps)
        head_w = params.get("lm_head", params["embed_tokens"])
        return (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)

    def parent_logits(tokens):
        lg, _, _ = llama.forward(base_cfg, params, tokens)
        return lg

    opt = optax.adam(lr)
    ost = opt.init(child_layers)
    T_ = temperature

    @jax.jit
    def step(layers_list, ost, tokens, teacher):
        def loss_fn(ls):
            lg = child_logits(ls, tokens)
            # KL(teacher || student) with temperature (distill.losses
            # LogitsDistillationLoss semantics)
            tp = jax.nn.softmax(teacher / T_, axis=-1)
            lsf = jax.nn.log_softmax(lg / T_, axis=-1)
            return -jnp.mean(jnp.sum(tp * lsf, axis=-1)) * T_ * T_

        loss, g = jax.value_and_grad(loss_fn)(layers_list)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(layers_list, up), ost, loss

    first = last = None
    pj = jax.jit(parent_logits)
    for i in range(steps):
        tokens = batches[i % len(batches)]
        teacher = pj(tokens)
        child_layers, ost, loss = step(child_layers, ost, tokens, teacher)
        if first is None:
            first = float(loss)
        last = float(loss)
    healed = [dataclasses.replace(c, params=(cp if c.params is not None else None))
              for c, cp in zip(result.layers, child_layers)]
    out = dataclasses.replace(result, layers=healed)
    return out, {"kd_loss_first": first, "kd_loss_last": last}


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
        x = _layer_out(cand.cfg, x, cand.params, positions, mask, cand.skip,
                       mamba_cfg=cand.mamba_cfg)
    x = llama.rms_norm(x, params["norm"], base_cfg.rms_norm_eps)
    head_w = params.get("lm_head", params["embed_tokens"])
    return (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)


# --------------------------------------------------------------------------
# Subblock cost models (reference `subblock_stats/`: params+memory+runtime)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SubblockStats:
    """Cost model for one candidate layer (reference
    `calc_subblock_params_and_memory.py` + `calc_runtime_stats.py`, as an
    analytic TPU roofline instead of vLLM runtime measurements)."""

    params: int
    weights_mib: float
    kv_cache_mib: float
    memory_mib: float
    decode_ms: float  # per decode token, this layer
    prefill_ms: float  # for the full prompt


def subblock_stats(
    cand: Candidate,
    *,
    batch: int = 1,
    seq_len: int = 4096,
    weight_bytes: float = 2.0,  # bf16; 0.5 for nvfp4/int4 serving
    kv_bytes: float = 2.0,
    hbm_gbps: float = 819.0,  # TPU v5e HBM bandwidth
    tflops: float = 197.0,  # TPU v5e bf16 peak
) -> SubblockStats:
    """Analytic roofline: per-step time = max(bytes/BW, flops/peak)."""
    if cand.cfg is None:  # no-op layer
        return SubblockStats(0, 0.0, 0.0, 0.0, 0.0, 0.0)
    cfg = cand.cfg
    sh = llama._layer_shapes(cfg)
    attn_names = ("self_attn.q_proj", "self_attn.k_proj",
                  "self_attn.v_proj", "self_attn.o_proj")
    mlp_names = ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj")
    names = []
    if cand.skip != "attn":
        names += list(attn_names)
    if cand.skip != "mlp":
        names += list(mlp_names)
    p = sum(int(np.prod(sh[n])) for n in names if n in sh) + 2 * cfg.hidden_size
    weights_b = p * weight_bytes
    kv_b = 0.0
    attn_flops_tok = 0.0
    if cand.skip != "attn":
        kv_dim = 2 * cfg.num_key_value_heads * cfg.hd
        kv_b = batch * seq_len * kv_dim * kv_bytes
        attn_flops_tok = 2.0 * 2.0 * cfg.num_attention_heads * cfg.hd * seq_len
    proj_flops_tok = 2.0 * sum(int(np.prod(sh[n])) for n in names if n in sh)
    # decode: read all weights + the kv cache once per step
    dec_bytes = weights_b + kv_b
    dec_flops = batch * (proj_flops_tok + attn_flops_tok)
    decode_ms = max(dec_bytes / (hbm_gbps * 1e9), dec_flops / (tflops * 1e12)) * 1e3
    # prefill: weights read once, flops dominate
    pre_flops = batch * seq_len * proj_flops_tok + batch * attn_flops_tok * seq_len / 2
    prefill_ms = max(weights_b / (hbm_gbps * 1e9), pre_flops / (tflops * 1e12)) * 1e3
    return SubblockStats(
        params=p,
        weights_mib=weights_b / 2**20,
        kv_cache_mib=kv_b / 2**20,
        memory_mib=(weights_b + kv_b) / 2**20,
        decode_ms=decode_ms,
        prefill_ms=prefill_ms,
    )


def _solve_multi_ilp(scores, constraint_rows, budgets):
    """One-hot-per-layer MILP with multiple <=-budget constraints.
    scores/each constraint row: [L, ncand]. Returns pick [L]."""
    L, ncand = scores.shape
    try:
        from scipy.optimize import Bounds, LinearConstraint, milp

        cons = []
        for row, b in zip(constraint_rows, budgets):
            cons.append(LinearConstraint(row.reshape(1, -1), -np.inf, b))
        onehot = np.zeros((L, L * ncand))
        for r in range(L):
            onehot[r, r * ncand : (r + 1) * ncand] = 1.0
        cons.append(LinearConstraint(onehot, 1.0, 1.0))
        res = milp(c=scores.reshape(-1), constraints=cons,
                   integrality=np.ones(L * ncand), bounds=Bounds(0, 1))
        if res.success:
            return np.argmax(res.x.reshape(L, ncand), axis=1)
    except Exception:
        pass
    # greedy fallback: cheapest (by first constraint) everywhere, then
    # upgrade best score-gain moves that fit ALL budgets
    main = constraint_rows[0]
    pick = np.argmin(main, axis=1)

    def fits(p):
        return all(row[np.arange(L), p].sum() <= b
                   for row, b in zip(constraint_rows, budgets))

    while True:
        best, best_gain = None, 0.0
        cur = scores[np.arange(L), pick].sum()
        for i in range(L):
            for j in range(ncand):
                if j == pick[i]:
                    continue
                trial = pick.copy()
                trial[i] = j
                if not fits(trial):
                    continue
                gain = cur - scores[np.arange(L), trial].sum()
                if gain > best_gain:
                    best, best_gain = (i, j), gain
        if best is None:
            return pick
        pick[best[0]] = best[1]


def run_puzzle_constrained(
    library: list[list[Candidate]],
    *,
    memory_budget_mib: Optional[float] = None,
    decode_budget_ms: Optional[float] = None,
    param_budget_ratio: Optional[float] = None,
    stats_kw: Optional[dict] = None,
) -> PuzzleResult:
    """MIP over the candidate library under memory and/or latency budgets
    (reference `mip/run_puzzle.py:764` 'stats.memory_mib'/'stats.runtime_ms'
    constraints; costs come from `subblock_stats` instead of vLLM runs)."""
    stats_kw = stats_kw or {}
    L = len(library)
    ncand = max(len(c) for c in library)
    scores = np.full((L, ncand), 1e9)
    stats = [[None] * ncand for _ in range(L)]
    for i, cands in enumerate(library):
        for j, c in enumerate(cands):
            scores[i, j] = c.score
            stats[i][j] = subblock_stats(c, **stats_kw)

    rows, budgets = [], []
    if memory_budget_mib is not None:
        rows.append(np.array([[s.memory_mib if s else 1e12 for s in r]
                              for r in stats]))
        budgets.append(memory_budget_mib)
    if decode_budget_ms is not None:
        rows.append(np.array([[s.decode_ms if s else 1e12 for s in r]
                              for r in stats]))
        budgets.append(decode_budget_ms)
    if param_budget_ratio is not None:
        costs = np.array([[c.cost for c in cands] + [0] * (ncand - len(cands))
                          for cands in library], dtype=float)
        full = sum(c.cost for cands in library for c in cands
                   if c.name == "full")
        rows.append(costs)
        budgets.append(param_budget_ratio * full)
    if not rows:
        raise ValueError("give at least one budget")

    pick = _solve_multi_ilp(scores, rows, budgets)
    chosen = [library[i][int(pick[i])] for i in range(L)]
    full = sum(c.cost for cands in library for c in cands if c.name == "full")
    return PuzzleResult(
        choices=[c.name for c in chosen],
        layers=chosen,
        total_params=int(sum(c.cost for c in chosen)),
        full_params=int(full),
    )


# --------------------------------------------------------------------------
# Checkpoint sewing kit (reference `puzzletron/sewing_kit` + anymodel
# converters: persist the stitched child as a standalone checkpoint)
# --------------------------------------------------------------------------


def save_child(path: str, base_cfg: llama.LlamaConfig,
               params: llama.Params, result: PuzzleResult) -> None:
    """Write the stitched heterogeneous child to `path`.

    Layout: `puzzle_config.json` (base config + one entry per layer with the
    candidate name, sub-block skip, and that layer's full config) and
    `model.safetensors` holding embed/norm/lm_head plus `layers.{i}.*`
    per-layer weights. The child is self-contained — `load_child` rebuilds a
    runnable PuzzleResult without the replacement library or the parent.
    """
    import json
    import os

    from ..opt.state import _model_cfg_to_dict, _save_safetensors

    os.makedirs(path, exist_ok=True)
    manifest = {
        "base_config": _model_cfg_to_dict(base_cfg),
        "choices": result.choices,
        "total_params": result.total_params,
        "full_params": result.full_params,
        "layers": [
            {
                "name": c.name,
                "skip": c.skip,
                "config": _model_cfg_to_dict(c.cfg) if c.cfg is not None else None,
            }
            for c in result.layers
        ],
    }
    with open(os.path.join(path, "puzzle_config.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    def cook(a):
        a = np.asarray(a)
        if a.dtype == jnp.bfloat16:
            return a.view(np.uint16), "::bf16"
        return a, ""

    named = {}
    for k in ("embed_tokens", "norm", "lm_head"):
        if k in params:
            a, tag = cook(params[k])
            named[k + tag] = a
    for i, c in enumerate(result.layers):
        if c.params is None:
            continue
        for pname, arr in c.params.items():
            a, tag = cook(arr)
            named[f"layers.{i}.{pname}{tag}"] = a
    _save_safetensors(os.path.join(path, "model.safetensors"), named)


def load_child(path: str) -> tuple[llama.LlamaConfig, llama.Params, PuzzleResult]:
    """Load a `save_child` checkpoint back into forward_hetero inputs."""
    import json
    import os

    from safetensors.numpy import load_file

    from ..opt.state import _model_cfg_from_dict

    with open(os.path.join(path, "puzzle_config.json")) as f:
        manifest = json.load(f)
    base_cfg = _model_cfg_from_dict(manifest["base_config"])

    raw = load_file(os.path.join(path, "model.safetensors"))
    arrays: dict = {}
    for k, v in raw.items():
        if k.endswith("::bf16"):
            arrays[k[: -len("::bf16")]] = jnp.asarray(v.view(np.uint16)).view(jnp.bfloat16)
        else:
            arrays[k] = jnp.asarray(v)

    params: llama.Params = {k: arrays[k] for k in ("embed_tokens", "norm", "lm_head")
                            if k in arrays}
    layers = []
    for i, ent in enumerate(manifest["layers"]):
        prefix = f"layers.{i}."
        lp = {k[len(prefix):]: v for k, v in arrays.items() if k.startswith(prefix)}
        ccfg = _model_cfg_from_dict(ent["config"]) if ent["config"] else None
        cost = _layer_param_count(ccfg) if ccfg is not None else 0
        layers.append(Candidate(ent["name"], ccfg, lp or None, cost,
                                skip=ent["skip"]))
    result = PuzzleResult(
        choices=manifest["choices"],
        layers=layers,
        total_params=manifest["total_params"],
        full_params=manifest["full_params"],
    )
    return base_cfg, params, result
