"""Mixtral-style MoE model with quantized experts (BASELINE config[4]).

Functional MoE decoder sharing llama's attention; the MLP is a top-k routed
expert layer. TPU-first choices:
 - Experts are stacked [E, ...] and computed with capacity-based one-hot
   dispatch/combine einsums (the standard SPMD MoE formulation) — every
   tensor is static-shaped, XLA turns the dispatch into dynamic-slice-free
   MXU work, and sharding the E axis over the mesh's "expert" axis gives
   expert parallelism with GSPMD-inserted all-to-alls.
 - Expert weight quantizers hold per-expert amax (the reference's
   GroupedQuantizer, `tensor_quantizer.py:1865`); amax reductions inside jit
   over expert-sharded weights become `all-reduce` over the expert axis —
   the EP sync of `model_calib.py:248-262` for free.
 - Routers are excluded from quantization by the default presets
   (`*router*` / `*gate.*` rules).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..quant import QuantizeConfig, QuantizerConfig, QuantizerState
from ..quant import quantizer as Q
from . import llama


@dataclasses.dataclass(frozen=True)
class MixtralConfig(llama.LlamaConfig):
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 2.0
    # renormalize top-k routing weights (Mixtral always does; Qwen3-MoE
    # exposes it as `norm_topk_prob`)
    norm_topk_prob: bool = True
    # GPT-OSS routing/activation variants (modeling_gpt_oss):
    # softmax over the top-k LOGITS instead of topk over the softmax
    router_softmax_after_topk: bool = False
    # Llama4 routing (modeling_llama4 Llama4TextMoe): sigmoid of the top-k
    # logits scales the expert INPUTS (experts are nonlinear, so this is
    # not equivalent to output scaling); outputs sum unweighted
    router_sigmoid_input_scaled: bool = False
    router_bias: bool = False
    moe_bias: bool = False  # per-expert gate/up/down biases
    # clamped swiglu: gate<=limit, |up|<=limit, (up+1)*gate*sigmoid(a*gate)
    swiglu_limit: Optional[float] = None
    swiglu_alpha: float = 1.702

    @staticmethod
    def tiny(**kw) -> "MixtralConfig":
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, dtype=jnp.float32,
            num_experts=4, top_k=2,
        )
        base.update(kw)
        return MixtralConfig(**base)


MOE_NAMES = ("moe.gate_proj", "moe.up_proj", "moe.down_proj")


def init_params(cfg: MixtralConfig, key: jax.Array) -> dict:
    params = llama.init_params(
        llama.LlamaConfig(**{
            f.name: getattr(cfg, f.name)
            for f in dataclasses.fields(llama.LlamaConfig)
        }),
        key,
    )
    # replace dense mlp with router + stacked experts
    L, E, h, inter = cfg.num_hidden_layers, cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(jax.random.fold_in(key, 99), 4)
    layers = dict(params["layers"])
    for name in ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"):
        del layers[name]
    def winit(k, shape, fan):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan)).astype(cfg.dtype)
    layers["moe.router"] = winit(keys[0], (L, E, h), h)
    layers["moe.gate_proj"] = winit(keys[1], (L, E, inter, h), h)
    layers["moe.up_proj"] = winit(keys[2], (L, E, inter, h), h)
    layers["moe.down_proj"] = winit(keys[3], (L, E, h, inter), inter)
    params["layers"] = layers
    return params


def param_specs(cfg: MixtralConfig) -> dict:
    specs = llama.param_specs(
        llama.LlamaConfig(**{
            f.name: getattr(cfg, f.name)
            for f in dataclasses.fields(llama.LlamaConfig)
        })
    )
    layers = dict(specs["layers"])
    for name in ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"):
        del layers[name]
    layers["moe.router"] = P(None, None, None)
    # experts sharded over the "expert" mesh axis; within-expert TP optional
    layers["moe.gate_proj"] = P(None, "expert", "tensor", None)
    layers["moe.up_proj"] = P(None, "expert", "tensor", None)
    layers["moe.down_proj"] = P(None, "expert", None, "tensor")
    specs["layers"] = layers
    return specs


def build_layout(cfg: MixtralConfig, qcfg: QuantizeConfig) -> llama.QuantLayout:
    sites = dict(llama.build_layout(cfg, qcfg).sites)
    for name in ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"):
        for kind in ("weight", "input", "output"):
            sites.pop(f"{name}.{kind}", None)
    for name in MOE_NAMES:
        full = f"model.layers.0.{name}"
        sites[f"{name}.weight"] = qcfg.resolve(f"{full}.weight_quantizer")
        sites[f"{name}.input"] = qcfg.resolve(f"{full}.input_quantizer")
    sites["moe.router.weight"] = qcfg.resolve("model.layers.0.moe.router.weight_quantizer")
    return llama.QuantLayout(sites=tuple(sites.items()))


def init_quant_state(cfg: MixtralConfig, layout: llama.QuantLayout) -> dict:
    base = llama.init_quant_state(
        llama.LlamaConfig(**{
            f.name: getattr(cfg, f.name)
            for f in dataclasses.fields(llama.LlamaConfig)
        }),
        llama.QuantLayout(
            sites=tuple(
                (k, v) for k, v in layout.sites if not k.startswith("moe.")
            )
        ),
    )
    for name in ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"):
        base.pop(name, None)
    L, E = cfg.num_hidden_layers, cfg.num_experts
    shapes = {
        "moe.gate_proj": (cfg.intermediate_size, cfg.hidden_size),
        "moe.up_proj": (cfg.intermediate_size, cfg.hidden_size),
        "moe.down_proj": (cfg.hidden_size, cfg.intermediate_size),
    }
    for name in MOE_NAMES:
        wcfg = layout.get(f"{name}.weight")
        icfg = layout.get(f"{name}.input")
        sub = {}
        if wcfg.enable:
            st = Q.init_state(wcfg, shapes[name])
            # per-expert amax: stack [L, E, ...] (GroupedQuantizer analog)
            sub["weight"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (L, E) + a.shape).copy(), st
            )
        if icfg.enable:
            st = Q.init_state(icfg, (1, 1, shapes[name][1]))
            sub["input"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), st
            )
        if sub:
            base[name] = sub
    return base


def route(cfg: MixtralConfig, logits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Routing-weight semantics shared by calibration/fake-quant forwards
    and the serving engine. logits [S, E] f32 -> (topw, topi) [S, k]."""
    k = cfg.top_k
    if cfg.router_sigmoid_input_scaled:
        topw, topi = jax.lax.top_k(logits, k)
        topw = jax.nn.sigmoid(topw)
    elif cfg.router_softmax_after_topk:
        # GPT-OSS GptOssTopKRouter: top-k on raw logits, softmax over the
        # k selected values
        topw, topi = jax.lax.top_k(logits, k)
        topw = jax.nn.softmax(topw, axis=-1)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        topw, topi = jax.lax.top_k(probs, k)
        if cfg.norm_topk_prob:
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    return topw, topi


def dispatch_combine(cfg: MixtralConfig, topw, topi, S: int, C: int):
    """Capacity-based one-hot dispatch/combine einsums [S, E, C]."""
    E, k = cfg.num_experts, cfg.top_k
    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # [S, k, E]
    pos = jnp.cumsum(onehot.reshape(S * k, E), axis=0).reshape(S, k, E) - 1.0
    in_cap = (pos < C) & (onehot > 0)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)  # [S,k,E,C]
    assign = onehot[..., None] * in_cap[..., None] * slot  # [S, k, E, C]
    if cfg.router_sigmoid_input_scaled:
        # Llama4: the routing weight scales the token ON THE WAY IN; the
        # expert outputs then sum unweighted
        dispatch = jnp.einsum("skec,sk->sec", assign, topw)
        combine = jnp.sum(assign, axis=1)
    else:
        dispatch = jnp.sum(assign, axis=1)  # [S, E, C]
        combine = jnp.einsum("skec,sk->sec", assign, topw)
    return dispatch, combine


def expert_act(cfg: MixtralConfig, g: jax.Array, u: jax.Array) -> jax.Array:
    """Expert nonlinearity in f32: silu*up, or GPT-OSS clamped swiglu."""
    gf, uf = g.astype(jnp.float32), u.astype(jnp.float32)
    if cfg.swiglu_limit is not None:
        gf = jnp.minimum(gf, cfg.swiglu_limit)
        uf = jnp.clip(uf, -cfg.swiglu_limit, cfg.swiglu_limit)
        return (uf + 1.0) * gf * jax.nn.sigmoid(cfg.swiglu_alpha * gf)
    return jax.nn.silu(gf) * uf


def _moe_mlp(cfg: MixtralConfig, x, lp, lstate, layout, calib):
    """Top-k routed expert MLP with capacity dispatch. x: [B, T, H]."""
    B, T, H = x.shape
    E, k = cfg.num_experts, cfg.top_k
    S = B * T
    C = max(int(cfg.capacity_factor * S * k / E), 1)
    xf = x.reshape(S, H)
    new_state = {}

    router_w = lp["moe.router"]  # [E, H]
    logits = (xf.astype(jnp.float32) @ router_w.T.astype(jnp.float32))  # [S, E]
    if cfg.router_bias:
        logits = logits + lp["moe.router__bias"].astype(jnp.float32)
    topw, topi = route(cfg, logits)
    dispatch, combine = dispatch_combine(cfg, topw, topi, S, C)

    xe = jnp.einsum("sec,sh->ech", dispatch, xf.astype(jnp.float32)).astype(x.dtype)

    def expert_ffn(xe_e, wg, wu, wd, bias, wst, ist):
        # xe_e [C, H]; weights (and optional biases) per expert
        def q(name, w, st):
            wcfg = layout.get(f"{name}.weight")
            if not wcfg.enable or calib:
                return w
            return Q.quantize(w, wcfg, st)
        icfg_g = layout.get("moe.gate_proj.input")
        h_in = xe_e
        # pre_quant_scale must apply even for weight-only AWQ presets
        # (input site disabled but the migration scale was folded out of
        # the weights) — same rule as llama._qsite / engine._moe_ffn
        has_pqs = ist is not None and ist.pre_quant_scale is not None
        if (icfg_g.enable or has_pqs) and not calib and ist is not None:
            h_in = Q.quantize(h_in, icfg_g, ist)
        g = h_in @ q("moe.gate_proj", wg, wst["moe.gate_proj"]).T.astype(h_in.dtype)
        u = h_in @ q("moe.up_proj", wu, wst["moe.up_proj"]).T.astype(h_in.dtype)
        if bias is not None:
            g = g + bias["gate"].astype(g.dtype)
            u = u + bias["up"].astype(u.dtype)
        y = expert_act(cfg, g, u).astype(xe_e.dtype)
        d = y @ q("moe.down_proj", wd, wst["moe.down_proj"]).T.astype(y.dtype)
        if bias is not None:
            d = d + bias["down"].astype(d.dtype)
        return d

    wst = {
        name: (lstate or {}).get(name, {}).get("weight", QuantizerState())
        for name in MOE_NAMES
    }
    ist = (lstate or {}).get("moe.gate_proj", {}).get("input")
    bias = ({"gate": lp["moe.gate_proj__bias"], "up": lp["moe.up_proj__bias"],
             "down": lp["moe.down_proj__bias"]} if cfg.moe_bias else None)
    ye = jax.vmap(expert_ffn, in_axes=(0, 0, 0, 0, 0 if cfg.moe_bias else None, 0, None))(
        xe,
        lp["moe.gate_proj"],
        lp["moe.up_proj"],
        lp["moe.down_proj"],
        bias,
        wst,
        ist,
    )  # [E, C, H]
    y = jnp.einsum("sec,ech->sh", combine, ye.astype(jnp.float32)).astype(x.dtype)

    if calib:
        for name in MOE_NAMES:
            wcfg = layout.get(f"{name}.weight")
            if wcfg.enable:
                st = (lstate or {}).get(name, {}).get("weight", QuantizerState())
                coll = jax.vmap(lambda w, s: Q.collect(w, wcfg, s))
                new_state.setdefault(name, {})["weight"] = coll(
                    lp[{"moe.gate_proj": "moe.gate_proj",
                        "moe.up_proj": "moe.up_proj",
                        "moe.down_proj": "moe.down_proj"}[name]],
                    st,
                )
        icfg = layout.get("moe.gate_proj.input")
        st_in = (lstate or {}).get("moe.gate_proj", {}).get("input")
        if icfg.enable or st_in is not None:
            # carry the state through even when the site is disabled —
            # weight-only AWQ parks pre_quant_scale here (llama._qsite rule)
            new_state.setdefault("moe.gate_proj", {})["input"] = Q.collect(
                x, icfg, st_in if st_in is not None else QuantizerState()
            )
    return y.reshape(B, T, H), new_state


def forward(
    cfg: MixtralConfig,
    params: dict,
    tokens: jax.Array,
    *,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
    capture_tokens: int = 0,
):
    """MoE forward (prefill-style; decode cache comes via the llama engine).

    With `capture_tokens > 0` returns (logits, states, captures) where
    captures = {"attn_in": [L, n, d], "moe_in": [L, n, d]} — the activation
    capture AutoQuantize scores against (llama `_grab` analog)."""
    if layout is None:
        layout = llama.QuantLayout(sites=())
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    x = params["embed_tokens"][tokens].astype(cfg.dtype)
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )[None, None, :, :].astype(jnp.float32)

    def body(carry, per_layer):
        x = carry
        lp, lstate = per_layer
        caps = {}
        h = llama.norm(cfg, x, lp["input_layernorm"])
        if capture_tokens:
            caps["attn_in"] = llama._grab(h, capture_tokens)
        attn, st_a, _, _ = llama._attention(
            cfg, h, lp, lstate, layout, positions, mask, None, calib
        )
        x = x + attn
        h = llama.norm(cfg, x, lp["post_attention_layernorm"])
        if capture_tokens:
            caps["moe_in"] = llama._grab(h, capture_tokens)
        moe_out, st_m = _moe_mlp(cfg, h, lp, lstate, layout, calib)
        x = x + moe_out
        return x, ({**st_a, **st_m}, caps)

    lstate = llama._strip_global(qstate)
    x, (new_lstate, captures) = jax.lax.scan(body, x, (params["layers"], lstate))
    x = llama.norm(cfg, x, params["norm"])
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    st = dict(new_lstate) if (calib or qstate) else None
    if capture_tokens:
        return logits, st, captures
    return logits, st


def forward_unrolled(
    cfg: MixtralConfig,
    params: dict,
    tokens: jax.Array,
    layer_layouts: list,
    qstate_list: Optional[list] = None,
    calib: bool = False,
):
    """Forward with a distinct quant layout per layer (auto_quantize_moe
    result) — the MoE analog of `llama.forward_unrolled`. Python-unrolled;
    returns (logits, new_states)."""
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    x = params["embed_tokens"][tokens].astype(cfg.dtype)
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )[None, None, :, :].astype(jnp.float32)
    new_states = []
    for i in range(cfg.num_hidden_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        lstate = qstate_list[i] if qstate_list else None
        layout = layer_layouts[i]
        h = llama.norm(cfg, x, lp["input_layernorm"])
        attn, st_a, _, _ = llama._attention(
            cfg, h, lp, lstate, layout, positions, mask, None, calib
        )
        x = x + attn
        h = llama.norm(cfg, x, lp["post_attention_layernorm"])
        moe_out, st_m = _moe_mlp(cfg, h, lp, lstate, layout, calib)
        x = x + moe_out
        new_states.append({**st_a, **st_m})
    x = llama.norm(cfg, x, params["norm"])
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    return logits, new_states
