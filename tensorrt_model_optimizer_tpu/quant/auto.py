"""AutoQuantize: per-layer format search under an effective-bits budget.

Re-creates `mtq.auto_quantize` (`model_quant.py:269`, `algorithms.py:271-`,
SURVEY §3.3): for each (layer, site-group) pick a format from a candidate
list, minimizing total sensitivity subject to a weight-size budget.

TPU-first mechanics:
 - Sensitivity scores use the reference's Taylor approximation
   score = E_tokens[(sum_d dL/dy_d * Δy_d)^2] (`algorithms.py:1432-1454`).
   dL/dy at every projection output comes from ONE backward pass via
   zero-probe injection (grad wrt an additive zero gives the output grad) —
   no hooks, no per-module re-runs. Δy = x @ (Q_c(W) - W)^T is evaluated for
   all layers at once on captured activations (layer dim = MXU batch dim).
 - The selection ILP (one-hot per group, Σ cost ≤ budget) is solved with
   scipy.optimize.milp (HiGHS) — the pulp analog of `opt/searcher.py:312` —
   with a greedy fallback.
 - Result applies as per-layer QuantLayouts via `llama.forward_unrolled`.

QKV and gate/up are grouped (same format within a group), matching the
reference's grouping rules.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from . import quantizer as Q
from .config import QuantizeConfig, get_preset
from .ptq import CAPTURE_GROUPS, _dynamic_like

GROUPS = list(CAPTURE_GROUPS.items())  # [(cap_key, member_names)]


@dataclasses.dataclass
class AutoQuantizeResult:
    # choice[layer][group_key] = candidate index
    choice: list[dict[str, int]]
    candidates: list[str | QuantizeConfig]
    scores: np.ndarray  # [n_groups_total, n_candidates]
    effective_bits: float
    layer_layouts: list[llama.QuantLayout]
    qstate_list: Optional[list] = None


def _collect_grads_and_inputs(cfg, params, tokens, capture_tokens):
    """One forward+backward collecting, per layer: group inputs X and output
    grads G at each projection, plus the fp outputs.

    Returns (caps: {key: [L, n, d_in]}, grads: {proj: [L, n, d_out]}).
    """
    n_cap = capture_tokens

    def fwd(probes):
        # re-implement the decoder stack inline so probes can be added at
        # projection outputs; reuses llama internals for the math.
        B, T = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
        x = params["embed_tokens"][tokens].astype(cfg.dtype)
        mask = jnp.where(
            jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
        )[None, None, :, :].astype(jnp.float32)
        caps = {}

        import math as _math

        for i in range(cfg.num_hidden_layers):
            lp = llama.slice_layer(params["layers"], i)
            h = llama.rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            caps[f"attn_in/{i}"] = llama._grab(h, n_cap)

            def proj(t, name, key):
                w = lp[name]
                y = t @ w.T.astype(t.dtype)
                flat = y.reshape(-1, y.shape[-1])
                pr = probes[f"{name}/{i}"]
                flat = flat.at[: pr.shape[0]].add(pr.astype(flat.dtype))
                return flat.reshape(y.shape)

            B_, T_, H = h.shape
            hd, nH, nKV = cfg.hd, cfg.num_attention_heads, cfg.num_key_value_heads
            q = proj(h, "self_attn.q_proj", i).reshape(B_, T_, nH, hd)
            k = proj(h, "self_attn.k_proj", i).reshape(B_, T_, nKV, hd)
            v = proj(h, "self_attn.v_proj", i).reshape(B_, T_, nKV, hd)
            q = llama.rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
            k = llama.rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
            rep = nH // nKV
            k_all = jnp.repeat(k, rep, axis=2)
            v_all = jnp.repeat(v, rep, axis=2)
            scores = jnp.einsum("bqnd,bknd->bnqk", q, k_all, preferred_element_type=jnp.float32)
            scores = scores / _math.sqrt(hd) + mask
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v_all).reshape(B_, T_, nH * hd)
            caps[f"o_in/{i}"] = llama._grab(ctx, n_cap)
            attn = proj(ctx, "self_attn.o_proj", i)
            x = x + attn
            h = llama.rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
            caps[f"mlp_in/{i}"] = llama._grab(h, n_cap)
            g = proj(h, "mlp.gate_proj", i)
            u = proj(h, "mlp.up_proj", i)
            y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
            caps[f"down_in/{i}"] = llama._grab(y, n_cap)
            d = proj(y, "mlp.down_proj", i)
            x = x + d
        x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
        head_w = params.get("lm_head", params["embed_tokens"])
        logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
        # next-token CE loss against the shifted input (self-supervised)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        ll = jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)
        loss = -jnp.mean(ll)
        return loss, caps

    shapes = llama._layer_shapes(cfg)
    probes = {}
    B, T = tokens.shape
    n = min(n_cap, B * T)
    for i in range(cfg.num_hidden_layers):
        for name in llama.PROJ_NAMES:
            o, _ = shapes[name]
            probes[f"{name}/{i}"] = jnp.zeros((n, o), jnp.float32)

    (loss, caps), vjp_fn = jax.vjp(lambda pr: fwd(pr), probes, has_aux=False)
    grads = vjp_fn((jnp.ones(()), jax.tree.map(jnp.zeros_like, caps)))[0]
    return caps, grads


def _candidate_delta_score(x, w, g, wcfg) -> jax.Array:
    """score = mean_tokens[(g . (x @ (Q(W)-W)^T))^2] for stacked layers."""
    if not wcfg.enable:
        return jnp.zeros(w.shape[0])
    qfn = lambda t: Q.quantize(t, _dynamic_like(wcfg), None)
    dw = (qfn(w.astype(jnp.float32)) - w.astype(jnp.float32))
    dy = jnp.einsum("lni,loi->lno", x.astype(jnp.float32), dw)
    tok = jnp.einsum("lno,lno->ln", dy, g.astype(jnp.float32))
    return jnp.mean(tok**2, axis=-1)  # [L]


def _candidate_kl_score(x, w, wcfg) -> jax.Array:
    """KL-div scoring mode (`AutoQuantizeKLDivSearcher`): output divergence
    of the quantized projection, softmax over the feature dim as a local
    distribution proxy — gradient-free (for when backward is unavailable)."""
    if not wcfg.enable:
        return jnp.zeros(w.shape[0])
    qfn = lambda t: Q.quantize(t, _dynamic_like(wcfg), None)
    x32 = x.astype(jnp.float32)
    y0 = jnp.einsum("lni,loi->lno", x32, w.astype(jnp.float32))
    y1 = jnp.einsum("lni,loi->lno", x32, qfn(w.astype(jnp.float32)))
    p = jax.nn.softmax(y0, axis=-1)
    kl = jnp.sum(
        p * (jax.nn.log_softmax(y0, axis=-1) - jax.nn.log_softmax(y1, axis=-1)),
        axis=-1,
    )
    return jnp.mean(kl, axis=-1)  # [L]


def auto_quantize(
    model_cfg: llama.LlamaConfig,
    params: llama.Params,
    candidates: Sequence[str | QuantizeConfig],
    calib_batches: Iterable[jax.Array],
    effective_bits: float = 6.0,
    capture_tokens: int = 64,
    score_method: str = "gradient",  # "gradient" (Taylor) | "kl_div"
    checkpoint_path: Optional[str] = None,
) -> AutoQuantizeResult:
    """Search per-(layer, group) formats under the effective-bits budget.

    `checkpoint_path`: optional .npz path for the scoring results — the
    expensive part of the search (the reference's search-state checkpoint,
    `model_quant.py:445-448`: resume skips re-scoring and goes straight to
    the LP solve, so budget changes re-solve in seconds).
    """
    import os

    batches = list(calib_batches)
    tokens = batches[0]
    resume = checkpoint_path is not None and os.path.exists(checkpoint_path)
    if not resume:
        caps, grads = jax.jit(
            lambda t: _collect_grads_and_inputs(model_cfg, params, t, capture_tokens)
        )(tokens)

    cand_cfgs = [get_preset(c) if isinstance(c, str) else c for c in candidates]
    L = model_cfg.num_hidden_layers
    shapes = llama._layer_shapes(model_cfg)

    # stack caps/grads back to [L, n, d]
    def stack(prefix):
        return jnp.stack([caps[f"{prefix}/{i}"] for i in range(L)])

    def stackg(name):
        return jnp.stack([grads[f"{name}/{i}"] for i in range(L)])

    group_rows = [(i, key) for key, _ in GROUPS for i in range(L)] if resume else []
    scores = []  # [n_rows, n_cand]
    costs = []  # weight bytes per candidate (effective bits * n_params)
    for cap_key, members in (() if resume else GROUPS):
        X = stack(cap_key)
        s_per_cand = []
        c_per_cand = []
        n_params_group = sum(
            shapes[m][0] * shapes[m][1] for m in members
        )
        for cand in cand_cfgs:
            total = jnp.zeros(L)
            bits = 16.0
            for m in members:
                wcfg = cand.resolve(f"model.layers.0.{m}.weight_quantizer")
                w = params["layers"][m]
                if score_method == "kl_div":
                    total = total + jax.jit(_candidate_kl_score, static_argnums=2)(X, w, wcfg)
                else:
                    gm = stackg(m)
                    total = total + jax.jit(_candidate_delta_score, static_argnums=3)(X, w, gm, wcfg)
                bits = min(bits, wcfg.fake_bits if wcfg.enable else 16.0)
            s_per_cand.append(np.asarray(total))
            c_per_cand.append(bits * n_params_group / 8.0)
        for i in range(L):
            group_rows.append((i, cap_key))
            scores.append([s[i] for s in s_per_cand])
            costs.append(list(c_per_cand))
    if resume:
        data = np.load(checkpoint_path)
        scores_np, costs_np = data["scores"], data["costs"]
    else:
        scores_np = np.asarray(scores)  # [rows, n_cand]
        costs_np = np.asarray(costs)
        if checkpoint_path:
            np.savez(checkpoint_path, scores=scores_np, costs=costs_np)

    total_params = sum(shapes[m][0] * shapes[m][1] for _, ms in GROUPS for m in ms) * L
    budget = effective_bits * total_params / 8.0

    pick = _solve_ilp(scores_np, costs_np, budget)

    choice = [dict() for _ in range(L)]
    for row, (layer, key) in enumerate(group_rows):
        choice[layer][key] = int(pick[row])

    layer_layouts = []
    for i in range(L):
        sites = {}
        for cap_key, members in GROUPS:
            cand = cand_cfgs[choice[i][cap_key]]
            for m in members:
                sites[f"{m}.weight"] = cand.resolve(f"model.layers.0.{m}.weight_quantizer")
                sites[f"{m}.input"] = cand.resolve(f"model.layers.0.{m}.input_quantizer")
        layer_layouts.append(llama.QuantLayout(sites=tuple(sites.items())))

    # Calibrate the mixed model (weights + act amax) with one unrolled pass
    # per batch (the post-search calibration step of `auto_quantize`).
    qstate_list = [
        {
            name: {
                k: Q.init_state(lay.get(f"{name}.{k}"), shape)
                for k, shape in (
                    ("weight", shapes[name]),
                    ("input", (1, 1, shapes[name][1])),
                )
                if lay.get(f"{name}.{k}").enable
            }
            for name in llama.PROJ_NAMES
            if any(lay.get(f"{name}.{k}").enable for k in ("weight", "input"))
        }
        for lay in layer_layouts
    ]
    calib_fn = jax.jit(
        lambda t, qs: llama.forward_unrolled(
            model_cfg, params, t, layer_layouts, qs, calib=True
        )[1]
    )
    for b in batches:
        new_states = calib_fn(b, qstate_list)
        qstate_list = [
            {**qstate_list[i], **new_states[i]} for i in range(L)
        ]

    achieved = float((costs_np[np.arange(len(pick)), pick]).sum() * 8.0 / total_params)
    return AutoQuantizeResult(
        choice=choice,
        candidates=list(candidates),
        scores=scores_np,
        effective_bits=achieved,
        layer_layouts=layer_layouts,
        qstate_list=qstate_list,
    )


def _solve_ilp(scores: np.ndarray, costs: np.ndarray, budget: float) -> np.ndarray:
    """One-hot selection minimizing Σ score s.t. Σ cost <= budget."""
    rows, ncand = scores.shape
    try:
        from scipy.optimize import Bounds, LinearConstraint, milp

        c = scores.reshape(-1)
        A_budget = costs.reshape(1, -1)
        onehot = np.zeros((rows, rows * ncand))
        for r in range(rows):
            onehot[r, r * ncand : (r + 1) * ncand] = 1.0
        constraints = [
            LinearConstraint(A_budget, -np.inf, budget),
            LinearConstraint(onehot, 1.0, 1.0),
        ]
        res = milp(
            c=c,
            constraints=constraints,
            integrality=np.ones(rows * ncand),
            bounds=Bounds(0, 1),
        )
        if res.success:
            x = res.x.reshape(rows, ncand)
            return np.argmax(x, axis=1)
    except Exception:
        pass
    # Greedy fallback: start with cheapest-format everywhere, upgrade the
    # highest score-reduction-per-byte moves while budget allows.
    pick = np.argmin(costs, axis=1)
    while True:
        cur_cost = costs[np.arange(rows), pick].sum()
        best_gain, best_move = 0.0, None
        for r in range(rows):
            for c_ in range(costs.shape[1]):
                dc = costs[r, c_] - costs[r, pick[r]]
                ds = scores[r, pick[r]] - scores[r, c_]
                if ds > 0 and cur_cost + dc <= budget:
                    gain = ds / max(dc, 1.0)
                    if gain > best_gain:
                        best_gain, best_move = gain, (r, c_)
        if best_move is None:
            return pick
        pick[best_move[0]] = best_move[1]


# --------------------------------------------------------------------------
# MoE AutoQuantize with the active-expert cost model
# --------------------------------------------------------------------------


@dataclasses.dataclass
class AutoQuantizeMoEResult:
    choice: list  # per layer: {"attn": cand_idx, "moe": cand_idx}
    layer_layouts: list
    effective_bits: float
    expert_cost_ratio: float


def auto_quantize_moe(
    cfg,  # mixtral.MixtralConfig
    params,
    candidates: Sequence[str | QuantizeConfig],
    calib_batches: Iterable[jax.Array],
    effective_bits: float = 6.0,
    capture_tokens: int = 64,
    expert_cost_ratio: Optional[float] = None,
    forward_fn=None,
) -> AutoQuantizeMoEResult:
    """AutoQuantize for routed-MoE models with active-expert costing.

    The reference's ActiveMoECostModel (`_auto_quantize_cost.py:166`) scales
    routed-expert weight cost by top_k/num_experts — per decoded token only
    the active experts' bytes are read, so effective-bits budgets should
    count them at the active ratio. Scores are KL-div on captured layer
    inputs (gradient-free); expert scores average over experts weighted by
    the same usage ratio.
    """
    from ..models import mixtral

    batches = list(calib_batches)
    tokens = batches[0]
    ratio = (expert_cost_ratio if expert_cost_ratio is not None
             else cfg.top_k / cfg.num_experts)  # infer_active_moe_expert_ratio
    fwd = forward_fn or mixtral.forward  # gpt_oss/llama4 share the signature
    _, _, caps = jax.jit(
        lambda t: fwd(cfg, params, t, capture_tokens=capture_tokens)
    )(tokens)
    X_attn, X_moe = caps["attn_in"], caps["moe_in"]

    cand_cfgs = [get_preset(c) if isinstance(c, str) else c for c in candidates]
    L, E = cfg.num_hidden_layers, cfg.num_experts
    H, I = cfg.hidden_size, cfg.intermediate_size
    hd, nH, nKV = cfg.hd, cfg.num_attention_heads, cfg.num_key_value_heads

    attn_members = ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                    "self_attn.o_proj"]
    attn_params = (2 * nH * hd * H + 2 * nKV * hd * H)
    expert_params = 3 * I * H * E  # raw bytes; cost scaled by `ratio`

    scores, costs = [], []
    for cand in cand_cfgs:
        s_attn = jnp.zeros(L)
        bits_a = 16.0
        for m in attn_members:
            wcfg = cand.resolve(f"model.layers.0.{m}.weight_quantizer")
            # o_proj scored on attn_in as a proxy (same hidden distribution)
            s_attn = s_attn + jax.jit(_candidate_kl_score, static_argnums=2)(
                X_attn, params["layers"][m], wcfg)
            bits_a = min(bits_a, wcfg.fake_bits if wcfg.enable else 16.0)
        s_moe = jnp.zeros(L)
        bits_m = 16.0
        for m in mixtral.MOE_NAMES:
            wcfg = cand.resolve(f"model.layers.0.{m}.weight_quantizer")
            w = params["layers"][m]  # [L, E, O, I]
            if m == "moe.down_proj":
                # down input = silu(X Wg^T) * (X Wu^T), computed per expert
                def down_score(e):
                    wg = params["layers"]["moe.gate_proj"][:, e]
                    wu = params["layers"]["moe.up_proj"][:, e]
                    x32 = X_moe.astype(jnp.float32)
                    g = jnp.einsum("lni,loi->lno", x32, wg.astype(jnp.float32))
                    u = jnp.einsum("lni,loi->lno", x32, wu.astype(jnp.float32))
                    y = jax.nn.silu(g) * u
                    return _candidate_kl_score(y, w[:, e], wcfg)
                per_e = [jax.jit(down_score)(e) for e in range(E)]
            else:
                per_e = [
                    jax.jit(_candidate_kl_score, static_argnums=2)(X_moe, w[:, e], wcfg)
                    for e in range(E)
                ]
            s_moe = s_moe + ratio * sum(per_e)
            bits_m = min(bits_m, wcfg.fake_bits if wcfg.enable else 16.0)
        scores.append((np.asarray(s_attn), np.asarray(s_moe)))
        costs.append((bits_a * attn_params / 8.0,
                      bits_m * expert_params * ratio / 8.0))

    rows_s, rows_c, rows_meta = [], [], []
    for i in range(L):
        rows_meta.append((i, "attn"))
        rows_s.append([s[0][i] for s in scores])
        rows_c.append([c[0] for c in costs])
        rows_meta.append((i, "moe"))
        rows_s.append([s[1][i] for s in scores])
        rows_c.append([c[1] for c in costs])

    total = (attn_params + expert_params * ratio) * L
    budget = effective_bits * total / 8.0
    pick = _solve_ilp(np.asarray(rows_s), np.asarray(rows_c), budget)

    choice = [dict() for _ in range(L)]
    for row, (layer, key) in enumerate(rows_meta):
        choice[layer][key] = int(pick[row])
    layer_layouts = []
    spent = 0.0
    for i in range(L):
        sites = {}
        ca = cand_cfgs[choice[i]["attn"]]
        cm_ = cand_cfgs[choice[i]["moe"]]
        for m in attn_members:
            sites[f"{m}.weight"] = ca.resolve(f"model.layers.0.{m}.weight_quantizer")
            sites[f"{m}.input"] = ca.resolve(f"model.layers.0.{m}.input_quantizer")
        for m in mixtral.MOE_NAMES:
            sites[f"{m}.weight"] = cm_.resolve(f"model.layers.0.{m}.weight_quantizer")
            sites[f"{m}.input"] = cm_.resolve(f"model.layers.0.{m}.input_quantizer")
        layer_layouts.append(llama.QuantLayout(sites=tuple(sites.items())))
        spent += rows_c[2 * i][choice[i]["attn"]] + rows_c[2 * i + 1][choice[i]["moe"]]
    achieved = spent * 8.0 / total
    return AutoQuantizeMoEResult(choice, layer_layouts, float(achieved), float(ratio))
