"""Llama4 text model (Scout-style all-MoE stack).

The reference quantizes `transformers.Llama4TextExperts` through its fused-
MoE wrapper (`quantization/plugins/huggingface.py:751`
`_QuantLlama4TextExperts`, transposed-expert calibration mixin). Here the
architecture is a first-class family on the mixtral stacked-expert MoE with
Llama4's five twists implemented natively:

 - **interleaved rope** (`modeling_llama4.apply_rotary_emb` rotates complex
   pairs, not split halves) — `llama.rope_interleaved`;
 - **nope layers**: every `no_rope_layer_interval`-th layer skips rope and
   instead applies log-floor **attention temperature tuning** to q
   (`attn_scale`, `floor_scale`);
 - **L2 qk-norm** (weightless RMS) after rope, rope layers only;
 - **chunked attention** on rope layers: keys visible only within the same
   `attention_chunk_size` chunk (nope layers stay fully causal — they carry
   the long-range context);
 - **sigmoid input-scaled routing + shared expert**: the top-k logit's
   sigmoid scales the token into its expert (mixtral
   `router_sigmoid_input_scaled`), and a dense shared expert is added to
   the routed output.

Per-layer flags (use_rope) ride the layer scan as xs so the compiled body
stays homogeneous. Only the all-MoE layout (`interleave_moe_layer_step=1`,
Scout-style) is supported; interleaved dense layers would make the scan
heterogeneous.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..quant import QuantizeConfig, QuantizerState
from ..quant import quantizer as Q
from . import llama, mixtral

SHARED_NAMES = ("shared.gate_proj", "shared.up_proj", "shared.down_proj")


@dataclasses.dataclass(frozen=True)
class Llama4Config(mixtral.MixtralConfig):
    num_experts: int = 16
    top_k: int = 1
    router_sigmoid_input_scaled: bool = True
    interleave_moe_layer_step: int = 1
    no_rope_layer_interval: int = 4
    # explicit per-layer rope flags (HF `no_rope_layers`: 1 = rope); when
    # set, overrides the interval rule
    no_rope_layers: "Optional[tuple]" = None
    attention_chunk_size: int = 8192
    attn_temperature_tuning: bool = True
    attn_scale: float = 0.1
    floor_scale: float = 8192.0
    use_qk_norm: bool = True

    def use_rope_layers(self) -> tuple:
        if self.no_rope_layers is not None:
            return tuple(bool(v) for v in self.no_rope_layers)
        return tuple(
            (i + 1) % self.no_rope_layer_interval != 0
            for i in range(self.num_hidden_layers)
        )

    @staticmethod
    def tiny(**kw) -> "Llama4Config":
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=96,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, dtype=jnp.float32,
            num_experts=4, top_k=1, attention_chunk_size=8,
            floor_scale=8.0,
        )
        base.update(kw)
        return Llama4Config(**base)


def init_params(cfg: Llama4Config, key: jax.Array) -> dict:
    assert cfg.interleave_moe_layer_step == 1, (
        "only the all-MoE (Scout-style) layout is supported")
    params = mixtral.init_params(cfg, key)
    L, h, inter = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(jax.random.fold_in(key, 111), 3)

    def winit(k, shape, fan):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan)).astype(cfg.dtype)

    layers = dict(params["layers"])
    layers["shared.gate_proj"] = winit(keys[0], (L, inter, h), h)
    layers["shared.up_proj"] = winit(keys[1], (L, inter, h), h)
    layers["shared.down_proj"] = winit(keys[2], (L, h, inter), inter)
    params["layers"] = layers
    return params


def param_specs(cfg: Llama4Config) -> dict:
    specs = mixtral.param_specs(cfg)
    layers = dict(specs["layers"])
    layers["shared.gate_proj"] = P(None, "tensor", None)
    layers["shared.up_proj"] = P(None, "tensor", None)
    layers["shared.down_proj"] = P(None, None, "tensor")
    specs["layers"] = layers
    return specs


def build_layout(cfg: Llama4Config, qcfg: QuantizeConfig) -> llama.QuantLayout:
    sites = dict(mixtral.build_layout(cfg, qcfg).sites)
    for name in SHARED_NAMES:
        full = f"model.layers.0.{name}"
        sites[f"{name}.weight"] = qcfg.resolve(f"{full}.weight_quantizer")
        sites[f"{name}.input"] = qcfg.resolve(f"{full}.input_quantizer")
    return llama.QuantLayout(sites=tuple(sites.items()))


def init_quant_state(cfg: Llama4Config, layout: llama.QuantLayout) -> dict:
    base = mixtral.init_quant_state(
        cfg,
        llama.QuantLayout(sites=tuple(
            (k, v) for k, v in layout.sites if not k.startswith("shared.")
        )),
    )
    L = cfg.num_hidden_layers
    shapes = {
        "shared.gate_proj": (cfg.intermediate_size, cfg.hidden_size),
        "shared.up_proj": (cfg.intermediate_size, cfg.hidden_size),
        "shared.down_proj": (cfg.hidden_size, cfg.intermediate_size),
    }
    for name in SHARED_NAMES:
        wcfg = layout.get(f"{name}.weight")
        icfg = layout.get(f"{name}.input")
        sub = {}
        if wcfg.enable:
            st = Q.init_state(wcfg, shapes[name])
            sub["weight"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), st)
        if icfg.enable:
            st = Q.init_state(icfg, (1, 1, shapes[name][1]))
            sub["input"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), st)
        if sub:
            base[name] = sub
    return base


def _l2norm(x, eps):
    x32 = x.astype(jnp.float32)
    return (x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
            ).astype(x.dtype)


def rope_or_temperature(cfg, q, k, positions, use_rope):
    """Llama4 q/k positional treatment, shared with the serving engine:
    interleaved rope (+ optional L2 qk-norm) on rope layers; log-floor
    attention-temperature tuning on nope layers (arXiv:2501.19399)."""
    qr = llama.rope_interleaved(q, positions, cfg.rope_theta, cfg.rope_scaling)
    kr = llama.rope_interleaved(k, positions, cfg.rope_theta, cfg.rope_scaling)
    if cfg.use_qk_norm:  # rope layers only (modeling_llama4)
        qr = _l2norm(qr, cfg.rms_norm_eps)
        kr = _l2norm(kr, cfg.rms_norm_eps)
    qn = q
    if cfg.attn_temperature_tuning:
        scales = (jnp.log1p(jnp.floor(
            (positions.astype(jnp.float32) + 1.0) / cfg.floor_scale
        )) * cfg.attn_scale + 1.0)
        qn = (q.astype(jnp.float32) * scales[..., None, None]).astype(q.dtype)
    return jnp.where(use_rope, qr, qn), jnp.where(use_rope, kr, k)


def _attention_l4(cfg, x, lp, lstate, layout, positions, mask, calib, use_rope):
    """Llama4 attention; `use_rope` is a scan-traced scalar bool."""
    hd = cfg.hd
    nH, nKV = cfg.num_attention_heads, cfg.num_key_value_heads
    B, T, _ = x.shape
    new_state = {}
    q, s = llama._linear(x, lp["self_attn.q_proj"], "self_attn.q_proj", layout, lstate, calib)
    if s: new_state["self_attn.q_proj"] = s
    k, s = llama._linear(x, lp["self_attn.k_proj"], "self_attn.k_proj", layout, lstate, calib)
    if s: new_state["self_attn.k_proj"] = s
    v, s = llama._linear(x, lp["self_attn.v_proj"], "self_attn.v_proj", layout, lstate, calib)
    if s: new_state["self_attn.v_proj"] = s
    q = q.reshape(B, T, nH, hd)
    k = k.reshape(B, T, nKV, hd)
    v = v.reshape(B, T, nKV, hd)

    q, k = rope_or_temperature(cfg, q, k, positions, use_rope)

    kcfg = layout.get("self_attn.k_bmm")
    vcfg = layout.get("self_attn.v_bmm")
    k, kst = llama._qsite(k, kcfg, (lstate or {}).get("self_attn.k_bmm"), calib)
    if kst is not None:
        new_state["self_attn.k_bmm"] = kst
    v, vst = llama._qsite(v, vcfg, (lstate or {}).get("self_attn.v_bmm"), calib)
    if vst is not None:
        new_state["self_attn.v_bmm"] = vst

    rep = nH // nKV
    k_all = jnp.repeat(k, rep, axis=2)
    v_all = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k_all,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v_all).reshape(B, T, nH * hd)
    out, s = llama._linear(ctx, lp["self_attn.o_proj"], "self_attn.o_proj",
                           layout, lstate, calib)
    if s: new_state["self_attn.o_proj"] = s
    return out, new_state


def _shared_mlp(x, lp, lstate, layout, calib):
    new_state = {}
    g, s = llama._linear(x, lp["shared.gate_proj"], "shared.gate_proj", layout, lstate, calib)
    if s: new_state["shared.gate_proj"] = s
    u, s = llama._linear(x, lp["shared.up_proj"], "shared.up_proj", layout, lstate, calib)
    if s: new_state["shared.up_proj"] = s
    y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
    d, s = llama._linear(y, lp["shared.down_proj"], "shared.down_proj", layout, lstate, calib)
    if s: new_state["shared.down_proj"] = s
    return d, new_state


def forward(
    cfg: Llama4Config,
    params: dict,
    tokens: jax.Array,
    *,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
    capture_tokens: int = 0,
):
    """Prefill forward; per-layer rope/nope + chunked/full masks via xs."""
    if layout is None:
        layout = llama.QuantLayout(sites=())
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    x = params["embed_tokens"][tokens].astype(cfg.dtype)
    rows = jnp.arange(T)[:, None]
    cols = jnp.arange(T)[None, :]
    causal = cols <= rows
    full_mask = jnp.where(causal, 0.0, -1e9)[None, None].astype(jnp.float32)
    chunk = cfg.attention_chunk_size
    chunk_mask = jnp.where(
        causal & (cols // chunk == rows // chunk), 0.0, -1e9
    )[None, None].astype(jnp.float32)
    use_rope = jnp.asarray(cfg.use_rope_layers(), jnp.bool_)

    def body(carry, per_layer):
        x = carry
        lp, lstate, ur = per_layer
        caps = {}
        # chunked attention rides the ROPE layers; nope layers stay fully
        # causal and carry the long-range context
        mask = jnp.where(ur, chunk_mask, full_mask)
        h = llama.norm(cfg, x, lp["input_layernorm"])
        if capture_tokens:
            caps["attn_in"] = llama._grab(h, capture_tokens)
        attn, st_a = _attention_l4(
            cfg, h, lp, lstate, layout, positions, mask, calib, ur)
        x = x + attn
        h = llama.norm(cfg, x, lp["post_attention_layernorm"])
        if capture_tokens:
            caps["moe_in"] = llama._grab(h, capture_tokens)
        moe_out, st_m = mixtral._moe_mlp(cfg, h, lp, lstate, layout, calib)
        shared_out, st_s = _shared_mlp(h, lp, lstate, layout, calib)
        x = x + moe_out + shared_out
        return x, ({**st_a, **st_m, **st_s}, caps)

    lstate = llama._strip_global(qstate)
    x, (new_lstate, captures) = jax.lax.scan(
        body, x, (params["layers"], lstate, use_rope))
    x = llama.norm(cfg, x, params["norm"])
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    st = dict(new_lstate) if (calib or qstate) else None
    if capture_tokens:
        return logits, st, captures
    return logits, st
