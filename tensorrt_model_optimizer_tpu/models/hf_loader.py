"""HF checkpoint loading: safetensors -> stacked params pytree.

Reads a Hugging Face Llama-family checkpoint directory (config.json +
*.safetensors) into our stacked-layer params layout. Weights keep the HF
[out, in] orientation (we compute y = x @ W^T), so tensors map 1:1.
"""

from __future__ import annotations

import json
import os
from glob import glob
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig, PROJ_NAMES, RopeScaling


def _rope_scaling_from_hf(d: dict) -> Optional[RopeScaling]:
    rs = d.get("rope_scaling")
    if not rs:
        return None
    rope_type = rs.get("rope_type", rs.get("type", "llama3"))
    if rope_type == "yarn":
        factor = float(rs.get("factor", 1.0))
        attention_factor = rs.get("attention_factor")
        mscale, mscale_all = rs.get("mscale"), rs.get("mscale_all_dim")
        if attention_factor is None and mscale and mscale_all:
            # DeepSeek-style yarn: temperature from the mscale pair
            # (transformers _compute_yarn_parameters)
            import math

            def _ms(m):
                return 0.1 * m * math.log(factor) + 1.0 if factor > 1 else 1.0

            attention_factor = _ms(mscale) / _ms(mscale_all)
        return RopeScaling(
            rope_type="yarn",
            factor=factor,
            attention_factor=attention_factor,
            beta_fast=float(rs.get("beta_fast") or 32.0),
            beta_slow=float(rs.get("beta_slow") or 1.0),
            truncate=bool(rs.get("truncate", True)),
            original_max_position_embeddings=int(
                rs.get("original_max_position_embeddings")
                or d.get("max_position_embeddings", 4096)
            ),
        )
    if rope_type != "llama3":
        raise NotImplementedError(f"rope_scaling type {rope_type!r} unsupported")
    return RopeScaling(
        rope_type=rope_type,
        factor=float(rs.get("factor", 8.0)),
        low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
        high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
        original_max_position_embeddings=int(
            rs.get("original_max_position_embeddings", 8192)
        ),
    )


def config_from_hf(d: dict) -> LlamaConfig:
    mt = d.get("model_type")
    return LlamaConfig(
        rope_scaling=_rope_scaling_from_hf(d),
        attention_bias=d.get("attention_bias", mt == "qwen2"),
        qk_norm=mt in ("qwen3", "qwen3_moe"),
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        intermediate_size=d["intermediate_size"],
        num_hidden_layers=d["num_hidden_layers"],
        num_attention_heads=d["num_attention_heads"],
        num_key_value_heads=d.get("num_key_value_heads", d["num_attention_heads"]),
        head_dim=d.get("head_dim"),
        rope_theta=d.get("rope_theta", 10000.0),
        rms_norm_eps=d.get("rms_norm_eps", 1e-5),
        tie_word_embeddings=d.get("tie_word_embeddings", False),
        max_position_embeddings=d.get("max_position_embeddings", 4096),
        dtype=jnp.bfloat16,
    )


def config_to_hf(cfg: LlamaConfig) -> dict:
    out: dict[str, Any] = {}
    if cfg.rope_scaling is not None:
        rs = cfg.rope_scaling
        out["rope_scaling"] = {
            "rope_type": rs.rope_type,
            "factor": rs.factor,
            "low_freq_factor": rs.low_freq_factor,
            "high_freq_factor": rs.high_freq_factor,
            "original_max_position_embeddings": rs.original_max_position_embeddings,
        }
    arch = ["Qwen3ForCausalLM"] if cfg.qk_norm else ["LlamaForCausalLM"]
    mt = "qwen3" if cfg.qk_norm else "llama"
    if getattr(cfg, "num_experts", None):  # MixtralConfig family
        mt = "qwen3_moe" if cfg.qk_norm else "mixtral"
        arch = ["Qwen3MoeForCausalLM"] if cfg.qk_norm else ["MixtralForCausalLM"]
        out |= {
            "num_experts" if cfg.qk_norm else "num_local_experts": cfg.num_experts,
            "num_experts_per_tok": cfg.top_k,
            "norm_topk_prob": cfg.norm_topk_prob,
        }
        if cfg.qk_norm:  # qwen3_moe: expert width is moe_intermediate_size
            out["moe_intermediate_size"] = cfg.intermediate_size
    return out | {
        "architectures": arch,
        "model_type": mt,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.hd,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "max_position_embeddings": cfg.max_position_embeddings,
        "torch_dtype": "bfloat16",
    }


class _LazyTensors:
    """Lazy dict-like view over a (possibly sharded) safetensors directory.

    Files are mmapped and tensors fetched on access, so loading a sharded
    70B checkpoint never materializes the full state dict on host — one
    stacked parameter at a time is the peak (streaming-load counterpart of
    the reference's `unified_export_hf_streaming.py:445`)."""

    def __init__(self, path: str):
        from safetensors import safe_open

        self._path = path
        self._map: dict[str, str] = {}
        self._handles: dict[str, object] = {}
        files = sorted(glob(os.path.join(path, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no safetensors under {path}")
        for f in files:
            with safe_open(f, framework="pt") as sf:
                for k in sf.keys():
                    self._map[k] = f

    def _handle(self, fname: str):
        if fname not in self._handles:
            from safetensors import safe_open

            self._handles[fname] = safe_open(fname, framework="pt")
        return self._handles[fname]

    def keys(self):
        return self._map.keys()

    def __contains__(self, k):
        return k in self._map

    def __getitem__(self, k: str) -> np.ndarray:
        import torch

        t = self._handle(self._map[k]).get_tensor(k)
        if t.dtype in (torch.bfloat16, torch.float16):
            return t.float().numpy()
        return t.numpy()


def _load_all_tensors(path: str) -> _LazyTensors:
    return _LazyTensors(path)


def _verified_transfer(arr, name: str, retries: int = 4) -> np.ndarray:
    """Device->host transfer with device-side fidelity check and retries.

    The axon relay backend has corrupted host transfers of trained tensors
    (observed twice on the anchor's down_proj after long training sessions;
    short sessions transfer cleanly — a transient relay fault, not a layout
    rule). Each attempt re-uploads the host copy and compares ON DEVICE; a
    mismatch retries through an alternate route (flattened transfer). Raises
    after `retries` failures rather than writing a silently-broken file.
    Single-pass on CPU (attempt 0 verifies cheaply there too)."""
    routes = [
        lambda a: np.asarray(a),
        lambda a: np.asarray(jnp.ravel(a)).reshape(a.shape),
        lambda a: np.asarray(a.astype(jnp.float32) + 0.0),
    ]
    last = None
    for attempt in range(retries):
        # .copy() immediately: long-held np.asarray results of relay arrays
        # have been observed to change after later transfers (staging-buffer
        # recycling) — verification would pass and the file still write junk
        host = routes[attempt % len(routes)](arr).copy()
        diff = float(jnp.max(jnp.abs(arr - jnp.asarray(host))))
        if diff == 0.0:
            return host
        last = diff
        import warnings

        warnings.warn(
            f"host transfer of {name} corrupted (max|diff|={diff}); retrying"
        )
    raise RuntimeError(
        f"host transfer of {name} failed verification {retries}x "
        f"(last max|diff|={last})"
    )


def save_hf_checkpoint(cfg: LlamaConfig, params: dict, path: str) -> None:
    """Inverse of `load_hf_checkpoint`: write config.json + model.safetensors.

    Unstacks the [L, ...] layer pytree back to per-layer HF tensor names so
    the directory round-trips through `load_hf_checkpoint` (and is readable
    by transformers). bf16 params are written via a uint16 view with an
    explicit BF16 dtype entry (safetensors numpy lacks bf16).
    """
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config_to_hf(cfg), f, indent=1)

    flat: dict[str, np.ndarray] = {}
    dev_sums: dict[str, float] = {}

    def put(name, arr):
        a = jnp.asarray(arr).astype(jnp.float32)
        dev_sums[name] = float(jnp.sum(a.astype(jnp.float64)))
        flat[name] = _verified_transfer(a, name)

    put("model.embed_tokens.weight", params["embed_tokens"])
    put("model.norm.weight", params["norm"])
    if not cfg.tie_word_embeddings:
        put("lm_head.weight", params.get("lm_head", params["embed_tokens"]))
    layers = params["layers"]
    hf_names = {
        "input_layernorm": "model.layers.{i}.input_layernorm.weight",
        "post_attention_layernorm": "model.layers.{i}.post_attention_layernorm.weight",
        "self_attn.q_proj": "model.layers.{i}.self_attn.q_proj.weight",
        "self_attn.k_proj": "model.layers.{i}.self_attn.k_proj.weight",
        "self_attn.v_proj": "model.layers.{i}.self_attn.v_proj.weight",
        "self_attn.o_proj": "model.layers.{i}.self_attn.o_proj.weight",
        "mlp.gate_proj": "model.layers.{i}.mlp.gate_proj.weight",
        "mlp.up_proj": "model.layers.{i}.mlp.up_proj.weight",
        "mlp.down_proj": "model.layers.{i}.mlp.down_proj.weight",
        "self_attn.q_proj__bias": "model.layers.{i}.self_attn.q_proj.bias",
        "self_attn.k_proj__bias": "model.layers.{i}.self_attn.k_proj.bias",
        "self_attn.v_proj__bias": "model.layers.{i}.self_attn.v_proj.bias",
        "self_attn.q_norm": "model.layers.{i}.self_attn.q_norm.weight",
        "self_attn.k_norm": "model.layers.{i}.self_attn.k_norm.weight",
    }
    for ours, fmt in hf_names.items():
        if ours not in layers:
            continue
        stacked = layers[ours]
        for i in range(cfg.num_hidden_layers):
            put(fmt.format(i=i), stacked[i])
    if "moe.gate_proj" in layers:
        # MoE stacks unstack to per-expert HF modules (qwen3_moe naming for
        # qk_norm configs, mixtral naming otherwise — matching what
        # `load_hf_moe_checkpoint` reads back for each model_type)
        E = layers["moe.gate_proj"].shape[1]
        if cfg.qk_norm:
            router_fmt = "model.layers.{i}.mlp.gate.weight"
            exp_fmt = "model.layers.{i}.mlp.experts.{e}.{proj}.weight"
            projs = {"moe.gate_proj": "gate_proj", "moe.up_proj": "up_proj",
                     "moe.down_proj": "down_proj"}
        else:
            router_fmt = "model.layers.{i}.block_sparse_moe.gate.weight"
            exp_fmt = "model.layers.{i}.block_sparse_moe.experts.{e}.{proj}.weight"
            projs = {"moe.gate_proj": "w1", "moe.up_proj": "w3",
                     "moe.down_proj": "w2"}
        for i in range(cfg.num_hidden_layers):
            put(router_fmt.format(i=i), layers["moe.router"][i])
            for ours, theirs in projs.items():
                for e in range(E):
                    put(exp_fmt.format(i=i, e=e, proj=theirs),
                        layers[ours][i, e])
    # Final pre-write audit: host checksums against the device-side sums
    # captured at transfer time — catches staging-buffer recycling that
    # happened AFTER the per-tensor verification (observed on the relay).
    for name, arr in flat.items():
        hs = float(arr.astype(np.float64).sum())
        if not np.isclose(hs, dev_sums[name], rtol=1e-5, atol=1e-4):
            raise RuntimeError(
                f"host buffer for {name} changed after transfer "
                f"(host sum {hs} vs device {dev_sums[name]}) — refusing to "
                "write a corrupt checkpoint"
            )
    save_file(flat, os.path.join(path, "model.safetensors"))


def load_hf_checkpoint(path: str, dtype=jnp.bfloat16) -> tuple[LlamaConfig, dict]:
    """Returns (config, params) from an HF Llama checkpoint directory."""
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg)
    cfg = LlamaConfig(**{**cfg.__dict__, "dtype": dtype})
    raw = _load_all_tensors(path)

    def get(name):
        return jnp.asarray(raw[name]).astype(dtype)

    L = cfg.num_hidden_layers
    layers: dict[str, Any] = {}
    stack = lambda fmt: jnp.stack([get(fmt.format(i=i)) for i in range(L)])
    layers["input_layernorm"] = stack("model.layers.{i}.input_layernorm.weight")
    layers["post_attention_layernorm"] = stack(
        "model.layers.{i}.post_attention_layernorm.weight"
    )
    hf_names = {
        "self_attn.q_proj": "model.layers.{i}.self_attn.q_proj.weight",
        "self_attn.k_proj": "model.layers.{i}.self_attn.k_proj.weight",
        "self_attn.v_proj": "model.layers.{i}.self_attn.v_proj.weight",
        "self_attn.o_proj": "model.layers.{i}.self_attn.o_proj.weight",
        "mlp.gate_proj": "model.layers.{i}.mlp.gate_proj.weight",
        "mlp.up_proj": "model.layers.{i}.mlp.up_proj.weight",
        "mlp.down_proj": "model.layers.{i}.mlp.down_proj.weight",
    }
    for ours, fmt in hf_names.items():
        layers[ours] = stack(fmt)
    if cfg.attention_bias:
        for proj in ("q_proj", "k_proj", "v_proj"):
            layers[f"self_attn.{proj}__bias"] = stack(
                "model.layers.{i}.self_attn." + proj + ".bias"
            )
    if cfg.qk_norm:
        layers["self_attn.q_norm"] = stack("model.layers.{i}.self_attn.q_norm.weight")
        layers["self_attn.k_norm"] = stack("model.layers.{i}.self_attn.k_norm.weight")
    params = {
        "embed_tokens": get("model.embed_tokens.weight"),
        "layers": layers,
        "norm": get("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        if "lm_head.weight" in raw:
            params["lm_head"] = get("lm_head.weight")
        else:
            params["lm_head"] = params["embed_tokens"]
    return cfg, params


def _load_gpt_oss(path: str, d: dict, dtype):
    """GPT-OSS: fused-expert MoE with biases, sinks, alternating windows.

    De-interleaves `mlp.experts.gate_up_proj` [E, H, 2I] (gate = even
    columns, up = odd — `modeling_gpt_oss.GptOssExperts.forward`) into this
    framework's stacked [E, I, H] gate/up planes, and transposes `down_proj`
    [E, I, H] -> [E, H, I] (we compute y @ W^T). The reference handles this
    architecture via `_QuantGptOssExperts` dynamic-attribute wrappers
    (`quantization/plugins/huggingface.py:1465`)."""
    from .gpt_oss import GptOssConfig

    base = config_from_hf(d)
    E = d.get("num_local_experts", d.get("num_experts"))
    cfg = GptOssConfig(**{
        **base.__dict__, "dtype": dtype,
        "num_experts": E, "top_k": d.get("num_experts_per_tok", 4),
        "sliding_window": d.get("sliding_window", 128),
        "layer_types": tuple(d["layer_types"]) if d.get("layer_types") else None,
        "attention_bias": d.get("attention_bias", True),
    })
    raw = _load_all_tensors(path)
    get = lambda name: jnp.asarray(raw[name]).astype(dtype)
    L = cfg.num_hidden_layers
    stack = lambda fmt: jnp.stack([get(fmt.format(i=i)) for i in range(L)])

    def expert_weight(i: int, proj: str) -> jnp.ndarray:
        """bf16 expert tensor, dequantizing MXFP4-shipped checkpoints.

        Released GPT-OSS stores experts as `{proj}_blocks` [.., G, 16] uint8
        (two E2M1 codes per byte, lo nibble first) + `{proj}_scales` E8M0
        biased-127, blocks along the CONTRACTION dim, with a final
        transpose to the bf16 layout (transformers
        `integrations/mxfp4.convert_moe_packed_tensors`)."""
        base = f"model.layers.{i}.mlp.experts.{proj}"
        if f"{base}_blocks" not in raw:
            return get(base)
        from ..ops import numerics

        blocks = jnp.asarray(raw[f"{base}_blocks"])          # uint8
        exps = jnp.asarray(raw[f"{base}_scales"]).astype(jnp.int32) - 127
        b32 = blocks.astype(jnp.int32)
        lo = numerics.codes_to_fp4(b32 & 0xF)
        hi = numerics.codes_to_fp4((b32 >> 4) & 0xF)
        v = jnp.stack([lo, hi], axis=-1).reshape(
            blocks.shape[:-1] + (blocks.shape[-1] * 2,))
        v = v * jnp.ldexp(jnp.float32(1.0), exps)[..., None]
        v = v.reshape(v.shape[:-2] + (v.shape[-2] * v.shape[-1],))
        return jnp.swapaxes(v, -1, -2).astype(dtype)

    layers = {
        "input_layernorm": stack("model.layers.{i}.input_layernorm.weight"),
        "post_attention_layernorm": stack(
            "model.layers.{i}.post_attention_layernorm.weight"),
        "self_attn.sinks": stack("model.layers.{i}.self_attn.sinks"),
        "moe.router": stack("model.layers.{i}.mlp.router.weight"),
        "moe.router__bias": stack("model.layers.{i}.mlp.router.bias"),
    }
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        layers[f"self_attn.{proj}"] = stack(
            "model.layers.{i}.self_attn." + proj + ".weight")
        layers[f"self_attn.{proj}__bias"] = stack(
            "model.layers.{i}.self_attn." + proj + ".bias")
    gate_up = jnp.stack([expert_weight(i, "gate_up_proj") for i in range(L)])
    gu_bias = stack("model.layers.{i}.mlp.experts.gate_up_proj_bias")  # [L,E,2I]
    down = jnp.stack([expert_weight(i, "down_proj") for i in range(L)])
    layers["moe.gate_proj"] = jnp.swapaxes(gate_up[..., 0::2], -1, -2)
    layers["moe.up_proj"] = jnp.swapaxes(gate_up[..., 1::2], -1, -2)
    layers["moe.gate_proj__bias"] = gu_bias[..., 0::2]
    layers["moe.up_proj__bias"] = gu_bias[..., 1::2]
    layers["moe.down_proj"] = jnp.swapaxes(down, -1, -2)
    layers["moe.down_proj__bias"] = stack(
        "model.layers.{i}.mlp.experts.down_proj_bias")
    params = {
        "embed_tokens": get("model.embed_tokens.weight"),
        "layers": layers,
        "norm": get("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (get("lm_head.weight") if "lm_head.weight" in raw
                             else params["embed_tokens"])
    return cfg, params


def _load_llama4(path: str, d: dict, dtype):
    """Llama4 text stack (Scout-style all-MoE): fused Llama4TextExperts
    (`gate_up_proj` [E, H, 2I] CHUNKED — gate = first I columns, unlike
    GPT-OSS's interleave) + shared expert + sigmoid input-scaled router.
    Reference wrapper: `quantization/plugins/huggingface.py:751`
    `_QuantLlama4TextExperts`. Multimodal checkpoints nest the text config
    under `text_config` and prefix weights with `language_model.`."""
    from .llama4 import Llama4Config

    td = d.get("text_config", d)
    prefix = "language_model." if "text_config" in d else ""
    interleave = td.get("interleave_moe_layer_step", 1)
    if interleave != 1:
        raise NotImplementedError(
            "only all-MoE Llama4 (interleave_moe_layer_step=1) is supported")
    rs = _rope_scaling_from_hf(td)
    cfg = Llama4Config(
        vocab_size=td["vocab_size"], hidden_size=td["hidden_size"],
        intermediate_size=td["intermediate_size"],
        num_hidden_layers=td["num_hidden_layers"],
        num_attention_heads=td["num_attention_heads"],
        num_key_value_heads=td["num_key_value_heads"],
        head_dim=td.get("head_dim"),
        rope_theta=td.get("rope_theta", 500000.0),
        rope_scaling=rs,
        rms_norm_eps=td.get("rms_norm_eps", 1e-5),
        tie_word_embeddings=td.get("tie_word_embeddings", False),
        max_position_embeddings=td.get("max_position_embeddings", 4096),
        num_experts=td.get("num_local_experts", 16),
        top_k=td.get("num_experts_per_tok", 1),
        # HF serializes the resolved per-layer flags; honor them over the
        # default every-4th rule
        no_rope_layers=(tuple(td["no_rope_layers"])
                        if td.get("no_rope_layers") else None),
        no_rope_layer_interval=4,
        attention_chunk_size=td.get("attention_chunk_size", 8192),
        attn_temperature_tuning=bool(td.get("attn_temperature_tuning", True)),
        attn_scale=td.get("attn_scale", 0.1),
        floor_scale=td.get("floor_scale", 8192.0),
        use_qk_norm=td.get("use_qk_norm", True),
        dtype=dtype,
    )
    raw = _load_all_tensors(path)
    get = lambda name: jnp.asarray(raw[prefix + name]).astype(dtype)
    L, E, inter = cfg.num_hidden_layers, cfg.num_experts, cfg.intermediate_size
    stack = lambda fmt: jnp.stack([get(fmt.format(i=i)) for i in range(L)])

    layers = {
        "input_layernorm": stack("model.layers.{i}.input_layernorm.weight"),
        "post_attention_layernorm": stack(
            "model.layers.{i}.post_attention_layernorm.weight"),
        "moe.router": stack("model.layers.{i}.feed_forward.router.weight"),
    }
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        layers[f"self_attn.{proj}"] = stack(
            "model.layers.{i}.self_attn." + proj + ".weight")
    gate_up = stack("model.layers.{i}.feed_forward.experts.gate_up_proj")  # [L,E,H,2I]
    down = stack("model.layers.{i}.feed_forward.experts.down_proj")  # [L,E,I,H]
    layers["moe.gate_proj"] = jnp.swapaxes(gate_up[..., :inter], -1, -2)
    layers["moe.up_proj"] = jnp.swapaxes(gate_up[..., inter:], -1, -2)
    layers["moe.down_proj"] = jnp.swapaxes(down, -1, -2)
    for ours, theirs in (("shared.gate_proj", "gate_proj"),
                         ("shared.up_proj", "up_proj"),
                         ("shared.down_proj", "down_proj")):
        layers[ours] = stack(
            "model.layers.{i}.feed_forward.shared_expert." + theirs + ".weight")
    params = {
        "embed_tokens": get("model.embed_tokens.weight"),
        "layers": layers,
        "norm": get("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (get("lm_head.weight")
                             if prefix + "lm_head.weight" in raw
                             else params["embed_tokens"])
    return cfg, params


def _load_dbrx(path: str, d: dict, dtype):
    """DBRX: fused Wqkv + qkv clamp, LayerNorm blocks, fused expert GLU.

    The reference registers this MoE on the fly from the dynamically-loaded
    `transformers_modules.modeling_dbrx.DbrxExpertGLU`
    (`quantization/plugins/huggingface.py:1561`). Expert tensors arrive as
    [E*I, H] stacks (w1=gate, v1=up, w2=down — w2 applied UNtransposed, so
    our [out, in] layout takes its transpose)."""
    from .mixtral import MixtralConfig

    attn = d.get("attn_config", {})
    ffn = d.get("ffn_config", {})
    h = d["d_model"]
    nH = d["n_heads"]
    n_kv = attn.get("kv_n_heads", nH)
    E = ffn.get("moe_num_experts", 8)
    inter = ffn.get("ffn_hidden_size")
    cfg = MixtralConfig(
        vocab_size=d["vocab_size"], hidden_size=h, intermediate_size=inter,
        num_hidden_layers=d["n_layers"], num_attention_heads=nH,
        num_key_value_heads=n_kv,
        rope_theta=attn.get("rope_theta", 500000.0),
        rms_norm_eps=1e-5,  # nn.LayerNorm default
        norm_type="layernorm",
        clip_qkv=attn.get("clip_qkv"),
        tie_word_embeddings=d.get("tie_word_embeddings", False),
        max_position_embeddings=d.get("max_seq_len", 4096),
        num_experts=E, top_k=ffn.get("moe_top_k", 4),
        # moe_normalize_expert_weights: p-norm order, 1.0 == plain renorm
        norm_topk_prob=ffn.get("moe_normalize_expert_weights") is not None,
        dtype=dtype,
    )
    raw = _load_all_tensors(path)
    get = lambda name: jnp.asarray(raw[name]).astype(dtype)
    L, hd = cfg.num_hidden_layers, cfg.hd
    stack = lambda fmt: jnp.stack([get(fmt.format(i=i)) for i in range(L)])

    blk = "transformer.blocks.{i}."
    layers = {
        "input_layernorm": stack(blk + "norm_attn_norm.norm_1.weight"),
        "post_attention_layernorm": stack(blk + "norm_attn_norm.norm_2.weight"),
        "self_attn.o_proj": stack(blk + "norm_attn_norm.attn.out_proj.weight"),
        "moe.router": stack(blk + "ffn.router.layer.weight"),
    }
    qkv = stack(blk + "norm_attn_norm.attn.Wqkv.weight")  # [L, (nH+2kv)*hd, H]
    layers["self_attn.q_proj"] = qkv[:, : nH * hd]
    layers["self_attn.k_proj"] = qkv[:, nH * hd : (nH + n_kv) * hd]
    layers["self_attn.v_proj"] = qkv[:, (nH + n_kv) * hd :]
    # experts: [E*I, H] -> [E, I, H]; w2 is used untransposed (y @ w2), so
    # our [out=H, in=I] weight is its per-expert transpose
    w1 = stack(blk + "ffn.experts.mlp.w1").reshape(L, E, inter, h)
    v1 = stack(blk + "ffn.experts.mlp.v1").reshape(L, E, inter, h)
    w2 = stack(blk + "ffn.experts.mlp.w2").reshape(L, E, inter, h)
    layers["moe.gate_proj"] = w1
    layers["moe.up_proj"] = v1
    layers["moe.down_proj"] = jnp.swapaxes(w2, -1, -2)
    params = {
        "embed_tokens": get("transformer.wte.weight"),
        "layers": layers,
        "norm": get("transformer.norm_f.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (get("lm_head.weight") if "lm_head.weight" in raw
                             else params["embed_tokens"])
    return cfg, params


def load_hf_moe_checkpoint(path: str, dtype=jnp.bfloat16):
    """Load an HF MoE checkpoint (Qwen3-MoE or Mixtral) into MixtralConfig
    params with stacked [L, E, ...] experts.

    Name tables (transformers modeling_qwen3_moe / modeling_mixtral):
      qwen3_moe: mlp.gate (router), mlp.experts.{e}.{gate,up,down}_proj,
                 per-head q/k norms; expert width = moe_intermediate_size.
      mixtral:   block_sparse_moe.gate, experts.{e}.{w1,w3,w2}.
    The reference quantizes these via its fused-MoE HF plugin
    (`quantization/plugins/huggingface.py:751-1515`).
    """
    from .mixtral import MixtralConfig

    with open(os.path.join(path, "config.json")) as f:
        d = json.load(f)
    mt = d.get("model_type")
    if mt == "gpt_oss":
        return _load_gpt_oss(path, d, dtype)
    if mt in ("deepseek_v3", "deepseek_v2"):
        return load_hf_deepseek_checkpoint(path, dtype)
    if mt == "dbrx":
        return _load_dbrx(path, d, dtype)
    if mt in ("llama4", "llama4_text"):
        return _load_llama4(path, d, dtype)
    if mt == "qwen3_moe":
        router_fmt = "model.layers.{i}.mlp.gate.weight"
        exp_fmt = "model.layers.{i}.mlp.experts.{e}.{proj}.weight"
        projs = {"gate": "gate_proj", "up": "up_proj", "down": "down_proj"}
        inter = d["moe_intermediate_size"]
        norm_topk = d.get("norm_topk_prob", True)
    elif mt == "mixtral":
        router_fmt = "model.layers.{i}.block_sparse_moe.gate.weight"
        exp_fmt = "model.layers.{i}.block_sparse_moe.experts.{e}.{proj}.weight"
        projs = {"gate": "w1", "up": "w3", "down": "w2"}
        inter = d["intermediate_size"]
        norm_topk = True
    else:
        raise NotImplementedError(f"MoE model_type {mt!r}")
    E = d.get("num_experts", d.get("num_local_experts"))
    base = config_from_hf(d)
    cfg = MixtralConfig(**{
        **base.__dict__, "dtype": dtype, "intermediate_size": inter,
        "num_experts": E, "top_k": d.get("num_experts_per_tok", 2),
        "norm_topk_prob": norm_topk,
    })
    raw = _load_all_tensors(path)
    get = lambda name: jnp.asarray(raw[name]).astype(dtype)
    L = cfg.num_hidden_layers
    stack = lambda fmt: jnp.stack([get(fmt.format(i=i)) for i in range(L)])

    layers: dict[str, Any] = {
        "input_layernorm": stack("model.layers.{i}.input_layernorm.weight"),
        "post_attention_layernorm": stack(
            "model.layers.{i}.post_attention_layernorm.weight"),
        "moe.router": stack(router_fmt),
    }
    for ours in ("q_proj", "k_proj", "v_proj", "o_proj"):
        layers[f"self_attn.{ours}"] = stack(
            "model.layers.{i}.self_attn." + ours + ".weight")
    if cfg.qk_norm:
        layers["self_attn.q_norm"] = stack("model.layers.{i}.self_attn.q_norm.weight")
        layers["self_attn.k_norm"] = stack("model.layers.{i}.self_attn.k_norm.weight")
    for ours, theirs in (("moe.gate_proj", projs["gate"]),
                         ("moe.up_proj", projs["up"]),
                         ("moe.down_proj", projs["down"])):
        layers[ours] = jnp.stack([
            jnp.stack([get(exp_fmt.format(i=i, e=e, proj=theirs))
                       for e in range(E)])
            for i in range(L)
        ])
    params = {
        "embed_tokens": get("model.embed_tokens.weight"),
        "layers": layers,
        "norm": get("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (get("lm_head.weight") if "lm_head.weight" in raw
                             else params["embed_tokens"])
    return cfg, params


def _deinterleave_rope_rows(w, dr: int, head_dim: int = 0):
    """Permute rope-branch OUTPUT rows from interleaved to half-split order.

    Real DeepSeek checkpoints (`config.rope_interleave=True`) store the
    rope dims interleaved (x0, y0, x1, y1, ...): transformers'
    `apply_rotary_pos_emb_interleave` (modeling_deepseek_v3.py:283)
    view(d/2, 2).transpose's the ACTIVATIONS to half-split before the
    standard rotate_half. This framework rotates half-split directly
    (`llama.rope`), so the same permutation moves into the WEIGHT rows at
    load time: new[j] = old[2j], new[dr/2 + j] = old[2j + 1].

    `head_dim=0`: the last `dr` rows of `w` are the rope branch
    (kv_a_proj_with_mqa). `head_dim>0`: every head's last `dr` rows within
    each `head_dim` block are (q_proj / q_b_proj).
    Reference analog: `examples/deepseek/deepseek_v3/ptq.py:129` quantizes
    through DeepSeek's own modeling, inheriting its interleaved convention.
    """
    import numpy as np

    perm = np.concatenate([np.arange(0, dr, 2), np.arange(1, dr, 2)])
    if head_dim == 0:
        nope = w.shape[0] - dr
        return jnp.concatenate([w[:nope], w[nope:][perm]], axis=0)
    O = w.shape[0]
    heads = w.reshape(O // head_dim, head_dim, *w.shape[1:])
    nope = head_dim - dr
    fixed = jnp.concatenate(
        [heads[:, :nope], heads[:, nope:][:, perm]], axis=1)
    return fixed.reshape(w.shape)


def load_hf_deepseek_checkpoint(path: str, dtype=jnp.bfloat16):
    """Load a transformers-convention DeepSeek-V3/V2 checkpoint into
    DeepseekConfig params (split dense/MoE layer stacks, stacked [L, E]
    experts, rope branches de-interleaved to this repo's half-split rope).

    Name table: modeling_deepseek_v3 (q_a/q_b or q, kv_a_proj_with_mqa,
    kv_b, mlp.gate + e_score_correction_bias, mlp.experts.{e}.*,
    mlp.shared_experts.*). Reference analog:
    `examples/deepseek/deepseek_v3/ptq.py` + export plugin
    `mcore_deepseek.py`.
    """
    import jax

    from .deepseek import DeepseekConfig, _attn_shapes

    with open(os.path.join(path, "config.json")) as f:
        d = json.load(f)
    base = config_from_hf(d)
    cfg = DeepseekConfig(**{
        **base.__dict__, "dtype": dtype,
        "q_lora_rank": d.get("q_lora_rank") or 0,
        "kv_lora_rank": d["kv_lora_rank"],
        "qk_nope_head_dim": d["qk_nope_head_dim"],
        "qk_rope_head_dim": d["qk_rope_head_dim"],
        "v_head_dim": d["v_head_dim"],
        "n_routed_experts": d["n_routed_experts"],
        "num_experts_per_tok": d["num_experts_per_tok"],
        "n_shared_experts": d.get("n_shared_experts", 1),
        "moe_intermediate_size": d["moe_intermediate_size"],
        "first_k_dense_replace": d.get("first_k_dense_replace", 0),
        "n_group": d.get("n_group", 1),
        "topk_group": d.get("topk_group", 1),
        "routed_scaling_factor": d.get("routed_scaling_factor", 1.0),
        "norm_topk_prob": d.get("norm_topk_prob", True),
    })
    raw = _load_all_tensors(path)
    get = lambda name: jnp.asarray(raw[name]).astype(dtype)
    interleaved = d.get("rope_interleave", True)
    dr = cfg.qk_rope_head_dim
    Ld = cfg.first_k_dense_replace
    L = cfg.num_hidden_layers

    def attn_block(lo: int, hi: int) -> dict:
        rng = range(lo, hi)
        stk = lambda fmt: jnp.stack([get(fmt.format(i=i)) for i in rng])
        blk = {
            "input_layernorm": stk("model.layers.{i}.input_layernorm.weight"),
            "post_attention_layernorm": stk(
                "model.layers.{i}.post_attention_layernorm.weight"),
            "self_attn.kv_a_norm": stk(
                "model.layers.{i}.self_attn.kv_a_layernorm.weight"),
            "self_attn.kv_b_proj": stk(
                "model.layers.{i}.self_attn.kv_b_proj.weight"),
            "self_attn.o_proj": stk("model.layers.{i}.self_attn.o_proj.weight"),
        }
        kva = stk("model.layers.{i}.self_attn.kv_a_proj_with_mqa.weight")
        if interleaved:
            kva = jax.vmap(lambda w: _deinterleave_rope_rows(w, dr))(kva)
        blk["self_attn.kv_a_proj"] = kva
        fix_q = lambda w: (
            _deinterleave_rope_rows(w, dr, head_dim=cfg.qk_head_dim)
            if interleaved else w)
        if cfg.q_lora_rank:
            blk["self_attn.q_a_proj"] = stk(
                "model.layers.{i}.self_attn.q_a_proj.weight")
            blk["self_attn.q_a_norm"] = stk(
                "model.layers.{i}.self_attn.q_a_layernorm.weight")
            blk["self_attn.q_b_proj"] = jax.vmap(fix_q)(stk(
                "model.layers.{i}.self_attn.q_b_proj.weight"))
        else:
            blk["self_attn.q_proj"] = jax.vmap(fix_q)(stk(
                "model.layers.{i}.self_attn.q_proj.weight"))
        assert set(blk) >= set(
            f"self_attn.{k.split('.')[-1]}" for k in _attn_shapes(cfg))
        return blk

    params = {
        "embed_tokens": get("model.embed_tokens.weight"),
        "norm": get("model.norm.weight"),
        "lm_head": (get("lm_head.weight") if "lm_head.weight" in raw
                    else get("model.embed_tokens.weight")),
    }
    if Ld:
        dense = attn_block(0, Ld)
        for proj in ("gate_proj", "up_proj", "down_proj"):
            dense[f"mlp.{proj}"] = jnp.stack([
                get(f"model.layers.{i}.mlp.{proj}.weight") for i in range(Ld)])
        params["layers_dense"] = dense

    moe = attn_block(Ld, L)
    rng = range(Ld, L)
    moe["moe.router"] = jnp.stack(
        [get(f"model.layers.{i}.mlp.gate.weight") for i in rng])
    moe["moe.e_bias"] = jnp.stack([
        jnp.asarray(
            raw[f"model.layers.{i}.mlp.gate.e_score_correction_bias"]
        ).astype(jnp.float32)
        for i in rng
    ])
    E = cfg.n_routed_experts
    for proj in ("gate_proj", "up_proj", "down_proj"):
        moe[f"moe.{proj}"] = jnp.stack([
            jnp.stack([get(f"model.layers.{i}.mlp.experts.{e}.{proj}.weight")
                       for e in range(E)])
            for i in rng
        ])
        moe[f"shared.{proj}"] = jnp.stack([
            get(f"model.layers.{i}.mlp.shared_experts.{proj}.weight")
            for i in rng
        ])
    params["layers_moe"] = moe
    return cfg, params
