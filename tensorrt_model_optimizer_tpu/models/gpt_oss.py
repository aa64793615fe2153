"""GPT-OSS-style MoE model (fused-expert family, BASELINE §2.5 breadth).

The reference quantizes `transformers.GptOssExperts` through a fused-MoE
wrapper (`quantization/plugins/huggingface.py:1465` `_QuantGptOssExperts`)
and toggles a bmm-interception flag for the down_proj input quantizer. Here
the architecture is a first-class model family on top of the mixtral
stacked-expert MoE, with the three GPT-OSS twists implemented natively:

 - **attention sinks**: a learned per-head logit joins the softmax
   denominator and its mass is dropped (llama `_attention` handles the
   `self_attn.sinks` leaf; `modeling_gpt_oss.eager_attention_forward`);
 - **alternating sliding/full attention**: even layers see only the last
   `sliding_window` keys. The per-layer window flag rides the layer scan as
   an xs array so the compiled body stays homogeneous;
 - **clamped-swiglu experts with biases** and top-k-then-softmax routing
   (mixtral `_moe_mlp` cfg gates: `swiglu_limit`, `moe_bias`,
   `router_softmax_after_topk`, `router_bias`).

RoPE is yarn-scaled (llama `rope` handles `rope_type="yarn"`). The HF
checkpoint loader de-interleaves the fused `gate_up_proj` into this
family's stacked gate/up planes (`hf_loader.load_hf_moe_checkpoint`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..quant import QuantizeConfig
from . import llama, mixtral


@dataclasses.dataclass(frozen=True)
class GptOssConfig(mixtral.MixtralConfig):
    sliding_window: int = 128
    # "sliding_attention"/"full_attention" per layer; None = HF default
    # (alternating, sliding first)
    layer_types: Optional[tuple] = None
    attention_bias: bool = True      # all four projections carry biases
    router_bias: bool = True
    moe_bias: bool = True
    router_softmax_after_topk: bool = True
    swiglu_limit: Optional[float] = 7.0
    norm_topk_prob: bool = False

    def resolved_layer_types(self) -> tuple:
        if self.layer_types is not None:
            return tuple(self.layer_types)
        return tuple(
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(self.num_hidden_layers)
        )

    @staticmethod
    def tiny(**kw) -> "GptOssConfig":
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, dtype=jnp.float32,
            num_experts=4, top_k=2, sliding_window=8,
        )
        base.update(kw)
        return GptOssConfig(**base)


def init_params(cfg: GptOssConfig, key: jax.Array) -> dict:
    params = mixtral.init_params(cfg, key)
    L, E = cfg.num_hidden_layers, cfg.num_experts
    h, inter, nH = cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads
    layers = dict(params["layers"])
    layers["self_attn.sinks"] = jnp.zeros((L, nH), cfg.dtype)
    if cfg.attention_bias:
        layers["self_attn.o_proj__bias"] = jnp.zeros((L, h), cfg.dtype)
    if cfg.router_bias:
        layers["moe.router__bias"] = jnp.zeros((L, E), cfg.dtype)
    if cfg.moe_bias:
        layers["moe.gate_proj__bias"] = jnp.zeros((L, E, inter), cfg.dtype)
        layers["moe.up_proj__bias"] = jnp.zeros((L, E, inter), cfg.dtype)
        layers["moe.down_proj__bias"] = jnp.zeros((L, E, h), cfg.dtype)
    params["layers"] = layers
    return params


def param_specs(cfg: GptOssConfig) -> dict:
    specs = mixtral.param_specs(cfg)
    layers = dict(specs["layers"])
    layers["self_attn.sinks"] = P(None, None)
    if cfg.attention_bias:
        layers["self_attn.o_proj__bias"] = P(None, None)
    if cfg.router_bias:
        layers["moe.router__bias"] = P(None, None)
    if cfg.moe_bias:
        layers["moe.gate_proj__bias"] = P(None, "expert", "tensor")
        layers["moe.up_proj__bias"] = P(None, "expert", "tensor")
        layers["moe.down_proj__bias"] = P(None, "expert", None)
    specs["layers"] = layers
    return specs


def build_layout(cfg: GptOssConfig, qcfg: QuantizeConfig) -> llama.QuantLayout:
    return mixtral.build_layout(cfg, qcfg)


def init_quant_state(cfg: GptOssConfig, layout: llama.QuantLayout) -> dict:
    return mixtral.init_quant_state(cfg, layout)


def forward(
    cfg: GptOssConfig,
    params: dict,
    tokens: jax.Array,
    *,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
    capture_tokens: int = 0,
):
    """Prefill forward; mixtral scan body + per-layer sliding/full masks."""
    if layout is None:
        layout = llama.QuantLayout(sites=())
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    x = params["embed_tokens"][tokens].astype(cfg.dtype)
    rows = jnp.arange(T)[:, None]
    cols = jnp.arange(T)[None, :]
    full_mask = jnp.where(cols <= rows, 0.0, -1e9)[None, None].astype(jnp.float32)
    slide_mask = jnp.where(
        (cols <= rows) & (cols > rows - cfg.sliding_window), 0.0, -1e9
    )[None, None].astype(jnp.float32)
    is_sliding = jnp.asarray(
        [t == "sliding_attention" for t in cfg.resolved_layer_types()], jnp.bool_
    )

    def body(carry, per_layer):
        x = carry
        lp, lstate, sliding = per_layer
        caps = {}
        mask = jnp.where(sliding, slide_mask, full_mask)
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
        moe_out, st_m = mixtral._moe_mlp(cfg, h, lp, lstate, layout, calib)
        x = x + moe_out
        return x, ({**st_a, **st_m}, caps)

    lstate = llama._strip_global(qstate)
    x, (new_lstate, captures) = jax.lax.scan(
        body, x, (params["layers"], lstate, is_sliding)
    )
    x = llama.norm(cfg, x, params["norm"])
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    st = dict(new_lstate) if (calib or qstate) else None
    if capture_tokens:
        return logits, st, captures
    return logits, st
