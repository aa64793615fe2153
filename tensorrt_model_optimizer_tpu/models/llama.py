"""Llama-family model: functional pytree params + quantizer injection.

TPU-first redesign of the reference's model handling: instead of swapping
nn.Modules for QuantModules (`quantization/conversion.py:213`), the model is a
pure function over a params pytree with *quantization sites* threaded through
it. A site is named like the reference's quantizer attributes
(`model.layers.{i}.self_attn.q_proj.weight_quantizer`) so preset wildcards
apply unchanged; its config is static and its state is a pytree carried
through `lax.scan` (stacked across layers).

Weights are stored in the reference's [out, in] layout (y = x @ W^T) so all
quant-axis semantics carry over: axis=(0,) = per-output-channel, block
{-1: B} = input-dim blocks (`config.py:400` block_sizes semantics).

Parallelism: one `jax.sharding.Mesh` with axes (data, tensor). Weight
PartitionSpecs implement megatron-style column/row parallel; because amax
reductions happen inside jit over sharded tensors, GSPMD inserts the
all-reduce-MAX collectives automatically — the TP-axis-dependent sync rules
of `model_calib.py:408-498` fall out of the sharding instead of being
hand-coded.
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

Params = dict
QuantState = dict


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """Rope frequency scaling (HF `rope_scaling` dict): llama3 or yarn.

    llama3 mirrors transformers' `_compute_llama3_parameters`: wavelengths
    longer than `original_max_position_embeddings / low_freq_factor` are
    divided by `factor`, wavelengths shorter than `original /
    high_freq_factor` are kept, and the band between is smoothly
    interpolated. Without this, real llama-3.1 checkpoints degrade past ~8k
    context (reference consumes the HF config verbatim via AutoModel; we
    must reproduce the math).

    yarn mirrors `_compute_yarn_parameters` (NTK-by-parts interpolation with
    a linear ramp between beta_fast/beta_slow correction dims, plus the
    `0.1*ln(factor)+1` attention temperature on cos/sin) — GPT-OSS and
    DeepSeek-V3 checkpoints ship this.
    """

    rope_type: str = "llama3"
    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192
    # yarn-only knobs (transformers `_compute_yarn_parameters` names)
    attention_factor: Optional[float] = None
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    truncate: bool = True


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_hidden_layers: int = 22
    num_attention_heads: int = 32
    num_key_value_heads: int = 4
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 4096
    attention_bias: bool = False  # Qwen2-style q/k/v biases
    qk_norm: bool = False  # Qwen3-style per-head RMS norm on q/k pre-RoPE
    norm_type: str = "rmsnorm"  # "rmsnorm" | "layernorm" (DBRX)
    clip_qkv: Optional[float] = None  # DBRX-style qkv clamp
    # "einsum" (reference path) or "flash" (fused Pallas kernel for the
    # no-cache prefill/training case; decode and cached paths fall back)
    attn_impl: str = "einsum"
    dtype: Any = jnp.bfloat16

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        """A tiny config for tests (mirrors the reference's tiny-llama fixture)."""
        base = dict(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=128,
            dtype=jnp.float32,
        )
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def llama3_8b(**kw) -> "LlamaConfig":
        base = dict(
            vocab_size=128256,
            hidden_size=4096,
            intermediate_size=14336,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=8,
            rope_theta=500000.0,
            rope_scaling=RopeScaling(),  # llama-3.1 extended context
            max_position_embeddings=131072,
        )
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def llama3_70b(**kw) -> "LlamaConfig":
        base = dict(
            vocab_size=128256,
            hidden_size=8192,
            intermediate_size=28672,
            num_hidden_layers=80,
            num_attention_heads=64,
            num_key_value_heads=8,
            rope_theta=500000.0,
            rope_scaling=RopeScaling(),  # llama-3.1 extended context
            max_position_embeddings=131072,
        )
        base.update(kw)
        return LlamaConfig(**base)


# Per-layer projection shapes, [out, in]
def _layer_shapes(cfg: LlamaConfig) -> dict[str, tuple[int, int]]:
    h, hd = cfg.hidden_size, cfg.hd
    return {
        "self_attn.q_proj": (cfg.num_attention_heads * hd, h),
        "self_attn.k_proj": (cfg.num_key_value_heads * hd, h),
        "self_attn.v_proj": (cfg.num_key_value_heads * hd, h),
        "self_attn.o_proj": (h, cfg.num_attention_heads * hd),
        "mlp.gate_proj": (cfg.intermediate_size, h),
        "mlp.up_proj": (cfg.intermediate_size, h),
        "mlp.down_proj": (h, cfg.intermediate_size),
    }


PROJ_NAMES = (
    "self_attn.q_proj",
    "self_attn.k_proj",
    "self_attn.v_proj",
    "self_attn.o_proj",
    "mlp.gate_proj",
    "mlp.up_proj",
    "mlp.down_proj",
)
BMM_NAMES = ("self_attn.k_bmm", "self_attn.v_bmm")


def init_params(cfg: LlamaConfig, key: jax.Array) -> Params:
    """Random init (for tests/benches; real weights come from HF safetensors)."""
    keys = jax.random.split(key, 16)
    h = cfg.hidden_size
    L = cfg.num_hidden_layers
    shapes = _layer_shapes(cfg)

    def winit(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(cfg.dtype)

    layers: dict[str, Any] = {
        "input_layernorm": jnp.ones((L, h), cfg.dtype),
        "post_attention_layernorm": jnp.ones((L, h), cfg.dtype),
    }
    for i, name in enumerate(PROJ_NAMES):
        o, inp = shapes[name]
        layers[name] = winit(jax.random.fold_in(keys[0], i), (L, o, inp), inp)
    if cfg.attention_bias:
        for name in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"):
            o, _ = shapes[name]
            layers[name + "__bias"] = jnp.zeros((L, o), cfg.dtype)
    if cfg.qk_norm:
        layers["self_attn.q_norm"] = jnp.ones((L, cfg.hd), cfg.dtype)
        layers["self_attn.k_norm"] = jnp.ones((L, cfg.hd), cfg.dtype)
    params: Params = {
        "embed_tokens": winit(keys[1], (cfg.vocab_size, h), h),
        "layers": layers,
        "norm": jnp.ones((h,), cfg.dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = winit(keys[2], (cfg.vocab_size, h), h)
    return params


# --------------------------------------------------------------------------
# Sharding
# --------------------------------------------------------------------------


def param_specs(cfg: LlamaConfig) -> Params:
    """PartitionSpecs: megatron-style column/row parallel over axis 'tensor'.

    q/k/v/gate/up are column-parallel (out dim sharded); o/down are
    row-parallel (in dim sharded). Stacked layer dim is unsharded.
    """
    col = P(None, "tensor", None)
    row = P(None, None, "tensor")
    layers = {
        "input_layernorm": P(None, None),
        "post_attention_layernorm": P(None, None),
        "self_attn.q_proj": col,
        "self_attn.k_proj": col,
        "self_attn.v_proj": col,
        "self_attn.o_proj": row,
        "mlp.gate_proj": col,
        "mlp.up_proj": col,
        "mlp.down_proj": row,
    }
    if cfg.attention_bias:
        for name in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"):
            layers[name + "__bias"] = P(None, "tensor")
    if cfg.qk_norm:
        layers["self_attn.q_norm"] = P(None, None)
        layers["self_attn.k_norm"] = P(None, None)
    return {
        "embed_tokens": P("tensor", None),
        "layers": layers,
        "norm": P(None),
        **({} if cfg.tie_word_embeddings else {"lm_head": P("tensor", None)}),
    }


# --------------------------------------------------------------------------
# Quantization layout: site name -> config; state pytree stacked over layers
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class QuantLayout:
    """Resolved per-site quantizer configs (uniform across layers).

    `sites` maps short site keys ("self_attn.q_proj.weight") to configs.
    Built by matching the full reference-style names
    ("model.layers.0.self_attn.q_proj.weight_quantizer") against a
    QuantizeConfig's wildcard rules.
    """

    sites: tuple[tuple[str, QuantizerConfig], ...]

    def get(self, key: str) -> QuantizerConfig:
        for k, v in self.sites:
            if k == key:
                return v
        return Q.DISABLED

    def as_dict(self) -> dict[str, QuantizerConfig]:
        return dict(self.sites)


def build_layout(cfg: LlamaConfig, qcfg: QuantizeConfig) -> QuantLayout:
    sites = {}
    for name in PROJ_NAMES:
        full = f"model.layers.0.{name}"
        sites[f"{name}.weight"] = qcfg.resolve(f"{full}.weight_quantizer")
        sites[f"{name}.input"] = qcfg.resolve(f"{full}.input_quantizer")
        sites[f"{name}.output"] = qcfg.resolve(f"{full}.output_quantizer")
    for name in BMM_NAMES:
        sites[name] = qcfg.resolve(f"model.layers.0.{name}_quantizer")
    sites["lm_head.weight"] = qcfg.resolve("lm_head.weight_quantizer")
    sites["lm_head.input"] = qcfg.resolve("lm_head.input_quantizer")
    # QuantEmbedding (`nn/modules/quant_module.py` QuantEmbedding): weight-
    # only site on the token table; DISABLED by the default exclusions.
    sites["embed_tokens.weight"] = qcfg.resolve("model.embed_tokens.weight_quantizer")
    return QuantLayout(sites=tuple(sites.items()))


def init_quant_state(cfg: LlamaConfig, layout: QuantLayout) -> QuantState:
    """Quantizer state pytree; per-layer sites get a stacked leading L dim."""
    L = cfg.num_hidden_layers
    shapes = _layer_shapes(cfg)
    h, hd = cfg.hidden_size, cfg.hd

    def stacked(site_cfg: QuantizerConfig, shape) -> QuantizerState:
        st = Q.init_state(site_cfg, shape)
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), st)

    state: QuantState = {}
    for name in PROJ_NAMES:
        o, inp = shapes[name]
        wcfg = layout.get(f"{name}.weight")
        icfg = layout.get(f"{name}.input")
        sub = {}
        if wcfg.enable:
            sub["weight"] = stacked(wcfg, (o, inp))
        if icfg.enable:
            sub["input"] = stacked(icfg, (1, 1, inp))
        if sub:
            state[name] = sub
    for name in BMM_NAMES:
        bcfg = layout.get(name)
        if bcfg.enable:
            # KV site shape: [B, T, n_kv, hd] — amax per-tensor or per-head
            state[name] = stacked(bcfg, (1, 1, cfg.num_key_value_heads, hd))
    lw = layout.get("lm_head.weight")
    if lw.enable:
        state["lm_head.weight"] = Q.init_state(lw, (cfg.vocab_size, h))
    return state


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def layer_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """Bias-free LayerNorm (DBRX blocks use nn.LayerNorm(bias=False))."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def norm(cfg, x: jax.Array, w: jax.Array) -> jax.Array:
    """Config-selected block norm (rmsnorm default, layernorm for DBRX)."""
    fn = layer_norm if cfg.norm_type == "layernorm" else rms_norm
    return fn(x, w, cfg.rms_norm_eps)


def rope_freqs(
    hd: int, theta: float, scaling: Optional[RopeScaling] = None
) -> tuple:
    """Per-pair inverse frequencies + cos/sin attention factor, with the
    llama3 / yarn scaling variants applied (shared by the split-half `rope`
    and Llama4's interleaved `rope_interleaved`)."""
    half = hd // 2
    freqs = jnp.exp(
        -math.log(theta) * jnp.arange(0, half, dtype=jnp.float32) / half
    )
    attn_factor = 1.0
    if scaling is not None and scaling.rope_type == "yarn":
        # transformers modeling_rope_utils._compute_yarn_parameters:
        # NTK-by-parts — interpolate (freq/factor) below the beta_slow
        # correction dim, extrapolate (freq) above beta_fast, linear ramp
        # between; cos/sin get the 0.1*ln(factor)+1 temperature.
        orig = scaling.original_max_position_embeddings

        def corr_dim(n_rot):
            return (hd * math.log(orig / (n_rot * 2 * math.pi))) / (
                2 * math.log(theta)
            )

        low = corr_dim(scaling.beta_fast)
        high = corr_dim(scaling.beta_slow)
        if scaling.truncate:
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0.0), min(high, hd - 1)
        if low == high:
            high += 0.001
        ramp = jnp.clip(
            (jnp.arange(half, dtype=jnp.float32) - low) / (high - low), 0.0, 1.0
        )
        extrap_w = 1.0 - ramp
        freqs = (freqs / scaling.factor) * (1.0 - extrap_w) + freqs * extrap_w
        attn_factor = (
            scaling.attention_factor
            if scaling.attention_factor is not None
            else (0.1 * math.log(scaling.factor) + 1.0 if scaling.factor > 1 else 1.0)
        )
    if scaling is not None and scaling.rope_type == "llama3":
        # transformers modeling_rope_utils._compute_llama3_parameters
        wavelen = 2.0 * math.pi / freqs
        low_wl = scaling.original_max_position_embeddings / scaling.low_freq_factor
        high_wl = scaling.original_max_position_embeddings / scaling.high_freq_factor
        smooth = (
            scaling.original_max_position_embeddings / wavelen
            - scaling.low_freq_factor
        ) / (scaling.high_freq_factor - scaling.low_freq_factor)
        interp = (1.0 - smooth) * freqs / scaling.factor + smooth * freqs
        freqs = jnp.where(
            wavelen > low_wl,
            freqs / scaling.factor,
            jnp.where(wavelen < high_wl, freqs, interp),
        )
    return freqs, attn_factor


def rope(
    x: jax.Array,
    positions: jax.Array,
    theta: float,
    scaling: Optional[RopeScaling] = None,
) -> jax.Array:
    """Rotary embedding (split-half pairing); x: [B, T, n, hd]."""
    hd = x.shape[-1]
    half = hd // 2
    freqs, attn_factor = rope_freqs(hd, theta, scaling)
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, T, half]
    cos = (jnp.cos(angles) * attn_factor)[..., None, :]
    sin = (jnp.sin(angles) * attn_factor)[..., None, :]
    x1, x2 = x[..., :half], x[..., half:]
    y1 = x1 * cos - x2 * sin
    y2 = x2 * cos + x1 * sin
    return jnp.concatenate([y1.astype(x.dtype), y2.astype(x.dtype)], axis=-1)


def rope_interleaved(
    x: jax.Array,
    positions: jax.Array,
    theta: float,
    scaling: Optional[RopeScaling] = None,
) -> jax.Array:
    """Rotary embedding with interleaved (complex-pair) layout — Llama4's
    `apply_rotary_emb` rotates (x[2i], x[2i+1]) pairs, not split halves."""
    hd = x.shape[-1]
    freqs, attn_factor = rope_freqs(hd, theta, scaling)
    angles = positions[..., None].astype(jnp.float32) * freqs
    cos = (jnp.cos(angles) * attn_factor)[..., None, :]
    sin = (jnp.sin(angles) * attn_factor)[..., None, :]
    x1 = x[..., 0::2].astype(jnp.float32)
    x2 = x[..., 1::2].astype(jnp.float32)
    y1 = x1 * cos - x2 * sin
    y2 = x2 * cos + x1 * sin
    out = jnp.stack([y1, y2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def sink_softmax(scores: jax.Array, sinks: jax.Array, out_dtype) -> jax.Array:
    """GPT-OSS attention-sink softmax: a learned per-head logit joins the
    denominator and its probability mass is dropped
    (`modeling_gpt_oss.eager_attention_forward`). scores: [B, nH, T, S]."""
    sk = jnp.broadcast_to(
        sinks.astype(jnp.float32)[None, :, None, None],
        scores.shape[:3] + (1,))
    comb = jnp.concatenate([scores, sk], axis=-1)
    comb = comb - jnp.max(comb, axis=-1, keepdims=True)
    return jax.nn.softmax(comb, axis=-1)[..., :-1].astype(out_dtype)


def _qsite(x, site_cfg: QuantizerConfig, st, calib: bool):
    """Quantize (and optionally collect) at one site. Returns (y, new_state)."""
    if not site_cfg.enable and st is None:
        return x, st
    if calib:
        st = Q.collect(x, site_cfg, st if st is not None else QuantizerState())
        return x, st  # calibration runs unquantized (max_calibrate semantics)
    return Q.quantize(x, site_cfg, st), st


def _linear(x, w, name, layout: QuantLayout, lstate, calib, adapters=None,
            bias=None):
    """Quantized linear: y = q_in(x) @ q_w(w)^T (+ bias) (QuantLinear analog).

    `adapters` optionally carries per-layer LoRA factors {name: {"A", "B",
    "scale"}}; the low-rank path stays unquantized (QLoRA semantics,
    reference `quantization/plugins/peft.py`).
    """
    wcfg = layout.get(f"{name}.weight")
    icfg = layout.get(f"{name}.input")
    sub = dict(lstate.get(name, {})) if lstate is not None else {}
    x, ist = _qsite(x, icfg, sub.get("input"), calib)
    if ist is not None:
        sub["input"] = ist
    w_eff = w
    if wcfg.enable:
        wst = sub.get("weight")
        if calib:
            # weight stats are collected directly (weight_only path in
            # max_calibrate, `model_calib.py:187`)
            wst = Q.collect(w, wcfg, wst if wst is not None else QuantizerState())
            sub["weight"] = wst
        else:
            w_eff = Q.quantize(w, wcfg, wst)
    y = x @ w_eff.T.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if adapters is not None and name in adapters:
        ad = adapters[name]
        lo = (x @ ad["A"].T.astype(x.dtype)) @ ad["B"].T.astype(x.dtype)
        y = y + lo * ad["scale"].astype(y.dtype)
    return y, (sub if sub else None)


def _attention(cfg, x, lp, lstate, layout, positions, mask, cache_kv, calib, adapters=None):
    h, hd = cfg.hidden_size, cfg.hd
    nH, nKV = cfg.num_attention_heads, cfg.num_key_value_heads
    B, T, _ = x.shape
    new_state = {}

    q, s = _linear(x, lp["self_attn.q_proj"], "self_attn.q_proj", layout, lstate, calib, adapters, lp.get("self_attn.q_proj__bias"))
    if s: new_state["self_attn.q_proj"] = s
    k, s = _linear(x, lp["self_attn.k_proj"], "self_attn.k_proj", layout, lstate, calib, adapters, lp.get("self_attn.k_proj__bias"))
    if s: new_state["self_attn.k_proj"] = s
    v, s = _linear(x, lp["self_attn.v_proj"], "self_attn.v_proj", layout, lstate, calib, adapters, lp.get("self_attn.v_proj__bias"))
    if s: new_state["self_attn.v_proj"] = s
    if cfg.clip_qkv is not None:
        # DBRX clamps the fused qkv output (modeling_dbrx DbrxAttention);
        # elementwise, so clamping each split is equivalent
        q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
        k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
        v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)

    q = q.reshape(B, T, nH, hd)
    k = k.reshape(B, T, nKV, hd)
    v = v.reshape(B, T, nKV, hd)
    if cfg.qk_norm:
        # Qwen3: per-head RMS norm on q/k before RoPE
        q = rms_norm(q, lp["self_attn.q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["self_attn.k_norm"], cfg.rms_norm_eps)
    q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
    k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)

    # KV-cache quantizers (the reference's *_bmm_quantizer sites,
    # `plugins/huggingface.py:78`): applied to k/v post-rope, pre-cache.
    kcfg = layout.get("self_attn.k_bmm")
    vcfg = layout.get("self_attn.v_bmm")
    k, kst = _qsite(k, kcfg, (lstate or {}).get("self_attn.k_bmm"), calib)
    if kst is not None:
        new_state["self_attn.k_bmm"] = kst
    v, vst = _qsite(v, vcfg, (lstate or {}).get("self_attn.v_bmm"), calib)
    if vst is not None:
        new_state["self_attn.v_bmm"] = vst

    new_cache = None
    if cache_kv is not None:
        ck, cv, cache_pos = cache_kv
        ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype), cache_pos, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype), cache_pos, axis=1)
        k_all, v_all = ck, cv
        new_cache = (ck, cv)
    else:
        k_all, v_all = k, v

    sinks = lp.get("self_attn.sinks")  # [nH] GPT-OSS learned sink logits
    if cache_kv is None and cfg.attn_impl == "flash" and sinks is None:
        # Fused flash kernel (pure causal prefill/training; the cached
        # decode path keeps the masked einsum which handles cache[0:pos+T])
        from ..ops.pallas import flash_wrapper

        ctx = flash_wrapper.flash_attention(q, k_all, v_all, causal=True)
        ctx = ctx.reshape(B, T, nH * hd)
    else:
        # GQA: repeat kv heads
        rep = nH // nKV
        k_all = jnp.repeat(k_all, rep, axis=2)
        v_all = jnp.repeat(v_all, rep, axis=2)

        scores = jnp.einsum("bqnd,bknd->bnqk", q, k_all, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(hd)
        scores = scores + mask
        if sinks is not None:
            probs = sink_softmax(scores, sinks, x.dtype)
        else:
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v_all)
        ctx = ctx.reshape(B, T, nH * hd)

    out, s = _linear(ctx, lp["self_attn.o_proj"], "self_attn.o_proj", layout, lstate, calib, adapters, lp.get("self_attn.o_proj__bias"))
    if s: new_state["self_attn.o_proj"] = s
    return out, new_state, new_cache, ctx


def _mlp(x, lp, lstate, layout, calib, adapters=None):
    new_state = {}
    g, s = _linear(x, lp["mlp.gate_proj"], "mlp.gate_proj", layout, lstate, calib, adapters)
    if s: new_state["mlp.gate_proj"] = s
    u, s = _linear(x, lp["mlp.up_proj"], "mlp.up_proj", layout, lstate, calib, adapters)
    if s: new_state["mlp.up_proj"] = s
    y = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
    d, s = _linear(y, lp["mlp.down_proj"], "mlp.down_proj", layout, lstate, calib, adapters)
    if s: new_state["mlp.down_proj"] = s
    return d, new_state, y


def _decoder_layer(
    cfg, layout, calib, x, lp, lstate, positions, mask, cache_kv, capture_tokens=0,
    adapters=None,
):
    captures = {}
    h = norm(cfg, x, lp["input_layernorm"])
    if capture_tokens:
        captures["attn_in"] = _grab(h, capture_tokens)
    attn, st_a, new_cache, o_in = _attention(
        cfg, h, lp, lstate, layout, positions, mask, cache_kv, calib, adapters
    )
    if capture_tokens:
        captures["o_in"] = _grab(o_in, capture_tokens)
    x = x + attn
    h = norm(cfg, x, lp["post_attention_layernorm"])
    if capture_tokens:
        captures["mlp_in"] = _grab(h, capture_tokens)
    mlp_out, st_m, down_in = _mlp(h, lp, lstate, layout, calib, adapters)
    if capture_tokens:
        captures["down_in"] = _grab(down_in, capture_tokens)
    x = x + mlp_out
    new_state = {**st_a, **st_m}
    return x, new_state, new_cache, captures


def _grab(x: jax.Array, n_tokens: int) -> jax.Array:
    """Flatten [B, T, D] -> first n_tokens rows (activation capture for the
    sequential calibration algorithms — the functional analog of the
    reference's forward hooks in awq/smoothquant, `model_calib.py:1571`)."""
    flat = x.reshape(-1, x.shape[-1])
    n = min(n_tokens, flat.shape[0])
    return flat[:n]


def forward(
    cfg: LlamaConfig,
    params: Params,
    tokens: jax.Array,
    *,
    layout: Optional[QuantLayout] = None,
    qstate: Optional[QuantState] = None,
    calib: bool = False,
    cache: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
    capture_tokens: int = 0,
    adapters: Optional[dict] = None,
    mask: Optional[jax.Array] = None,
    input_embeds: Optional[jax.Array] = None,
):
    """Forward pass.

    Returns (logits, new_qstate, new_cache) — or, with `capture_tokens > 0`,
    (logits, new_qstate, new_cache, captures) where captures maps
    {"attn_in", "o_in", "mlp_in", "down_in"} to stacked [L, n_tokens, d]
    activations for the sequential calibration algorithms.
    `layout=None` -> plain bf16 model. `calib=True` -> run unquantized while
    collecting amax into qstate. `cache` is a dict {"k": [L,B,S,nKV,hd],
    "v": ..., "pos": scalar} for incremental decoding.
    """
    if layout is None:
        layout = QuantLayout(sites=())
    # `input_embeds` [B, T, H] replaces the token-embedding lookup (VLM
    # composition: image patch embeddings prepended to text embeddings,
    # models/vlm.py); `tokens` may be None in that case.
    B, T = (input_embeds.shape[:2] if input_embeds is not None
            else tokens.shape)
    if positions is None:
        start = cache["pos"] if cache is not None else 0
        positions = start + jnp.arange(T)[None, :].astype(jnp.int32)
        positions = jnp.broadcast_to(positions, (B, T))

    ew_cfg = layout.get("embed_tokens.weight")
    ew_state = (qstate or {}).get("embed_tokens.weight")
    if input_embeds is not None:
        x = input_embeds.astype(cfg.dtype)
    else:
        emb_w = params["embed_tokens"]
        if ew_cfg.enable and not calib:
            emb_w = Q.quantize(emb_w, ew_cfg, ew_state)
        x = emb_w[tokens].astype(cfg.dtype)

    # Causal mask. With a cache, queries attend to cache[0:pos+T].
    # An explicit `mask` ([1,1,T,S] additive) overrides — used by tree
    # attention for speculative verification (speculative/tree.py).
    if mask is not None:
        # a non-causal mask can't go down the flash path
        if cfg.attn_impl == "flash":
            import dataclasses as _dc

            cfg = _dc.replace(cfg, attn_impl="einsum")
    elif cache is not None:
        S = cache["k"].shape[2]
        kpos = jnp.arange(S)[None, :]
        qpos = positions[0][:, None]
        mask = jnp.where(kpos <= qpos, 0.0, -1e9)[None, None, :, :].astype(jnp.float32)
    else:
        mask = jnp.where(
            jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
        )[None, None, :, :].astype(jnp.float32)

    # Per-layer qstate is stacked [L, ...]; scan over layers carries hidden
    # state and emits updated per-layer quant state.
    layer_params = params["layers"]
    L = cfg.num_hidden_layers

    def scan_body(carry, per_layer):
        x = carry
        lp, lstate, ck, cv, ad = per_layer
        cache_kv = (ck, cv, cache["pos"]) if cache is not None else None
        x, new_state, new_cache, caps = _decoder_layer(
            cfg, layout, calib, x, lp, lstate, positions, mask, cache_kv,
            capture_tokens, ad,
        )
        ys = (
            new_state,
            new_cache[0] if new_cache else ck,
            new_cache[1] if new_cache else cv,
            caps,
        )
        return x, ys

    lstate_stacked = qstate if qstate else None
    per_layer_state = _strip_global(lstate_stacked)
    ck = cache["k"] if cache is not None else jnp.zeros((L, 0), cfg.dtype)
    cv = cache["v"] if cache is not None else jnp.zeros((L, 0), cfg.dtype)
    xs = (layer_params, per_layer_state, ck, cv, adapters)
    x, (new_lstate, new_ck, new_cv, captures) = jax.lax.scan(scan_body, x, xs)

    x = norm(cfg, x, params["norm"])
    head_w = params.get("lm_head", params["embed_tokens"])
    new_qstate = dict(new_lstate) if new_lstate else {}
    lw_cfg = layout.get("lm_head.weight")
    lstate_global = (qstate or {}).get("lm_head.weight")
    if lw_cfg.enable:
        if calib:
            new_qstate["lm_head.weight"] = Q.collect(
                head_w, lw_cfg, lstate_global or QuantizerState()
            )
        else:
            head_w = Q.quantize(head_w, lw_cfg, lstate_global)
            new_qstate["lm_head.weight"] = lstate_global
    if ew_cfg.enable and calib:
        new_qstate["embed_tokens.weight"] = Q.collect(
            params["embed_tokens"], ew_cfg, ew_state or QuantizerState()
        )
    elif ew_cfg.enable:
        new_qstate["embed_tokens.weight"] = ew_state
    logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)

    new_cache = None
    if cache is not None:
        new_cache = {"k": new_ck, "v": new_cv, "pos": cache["pos"] + T}
    out_qstate = new_qstate if (calib or qstate) else None
    if capture_tokens:
        return logits, out_qstate, new_cache, captures
    return logits, out_qstate, new_cache


def slice_layer(tree, i: int):
    """Per-layer slice of a stacked [L, ...] pytree."""
    return jax.tree.map(lambda a: a[i], tree)


def forward_unrolled(
    cfg: LlamaConfig,
    params: Params,
    tokens: jax.Array,
    layer_layouts: list[QuantLayout],
    qstate_list: Optional[list] = None,
    calib: bool = False,
    cache: Optional[dict] = None,
):
    """Forward with a distinct quant layout per layer (AutoQuantize result).

    Python-unrolled over layers (mixed static formats can't ride one scan);
    used for eval/serving of mixed-precision models, not training loops.
    Quantizer state is a per-layer list (shapes differ across layers).
    With `cache` (same dict layout as `forward`), runs incremental decode.
    Returns (logits, new_states[, new_cache]).
    """
    B, T = tokens.shape
    start = cache["pos"] if cache is not None else 0
    positions = jnp.broadcast_to(
        start + jnp.arange(T)[None, :], (B, T)
    ).astype(jnp.int32)
    x = params["embed_tokens"][tokens].astype(cfg.dtype)
    if cache is not None:
        S = cache["k"].shape[2]
        kpos = jnp.arange(S)[None, :]
        qpos = positions[0][:, None]
        mask = jnp.where(kpos <= qpos, 0.0, -1e9)[None, None, :, :].astype(jnp.float32)
    else:
        mask = jnp.where(
            jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
        )[None, None, :, :].astype(jnp.float32)
    new_states = []
    new_k, new_v = [], []
    for i in range(cfg.num_hidden_layers):
        lp = slice_layer(params["layers"], i)
        lstate = qstate_list[i] if qstate_list else None
        cache_kv = (
            (cache["k"][i], cache["v"][i], cache["pos"]) if cache is not None else None
        )
        x, new_state, ncache, _ = _decoder_layer(
            cfg, layer_layouts[i], calib, x, lp, lstate, positions, mask, cache_kv
        )
        new_states.append(new_state)
        if ncache is not None:
            new_k.append(ncache[0])
            new_v.append(ncache[1])
    x = norm(cfg, x, params["norm"])
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    if cache is not None:
        new_cache = {
            "k": jnp.stack(new_k),
            "v": jnp.stack(new_v),
            "pos": cache["pos"] + T,
        }
        return logits, new_states, new_cache
    return logits, new_states


GLOBAL_SITES = ("lm_head", "embed_tokens")


def _strip_global(qstate):
    """Drop non-layer (global) sites so scan xs only carry stacked leaves."""
    if not qstate:
        return None
    return {
        k: v for k, v in qstate.items()
        if not k.startswith(GLOBAL_SITES)
    } or None


def merge_qstate(per_layer: Optional[dict], global_sites: Optional[dict]) -> dict:
    out = dict(per_layer or {})
    for k, v in (global_sites or {}).items():
        if k.startswith("lm_head"):
            out[k] = v
    return out


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=None) -> dict:
    dtype = dtype or cfg.dtype
    L = cfg.num_hidden_layers
    shape = (L, batch, max_len, cfg.num_key_value_heads, cfg.hd)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "pos": jnp.asarray(0, jnp.int32),
    }
