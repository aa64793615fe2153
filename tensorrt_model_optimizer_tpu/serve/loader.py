"""Deploy path: load an exported unified checkpoint into the serving engine.

The reference hands its unified checkpoints to TRT-LLM/vLLM; here the
deployment engine is ours, so this loader closes the loop:
`export_hf_checkpoint(...)` -> directory -> `load_quantized_checkpoint` ->
CompressedModel -> Engine. Handles the layout conversion from the exported
adjacent-nibble packing to the engine's plane packing.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..export import hf_export
from ..models import hf_loader, llama
from ..quant import quantizer as Q
from ..quant.compress import CompressedModel
from ..quant.config import get_preset


def _adjacent_to_plane(packed_adj: np.ndarray) -> np.ndarray:
    """[O, K/2] adjacent-packed nibbles (NVFP4 layout) -> [O/2, K] plane-packed."""
    O = packed_adj.shape[0]
    lo = packed_adj & 0xF
    hi = (packed_adj >> 4) & 0xF
    codes = np.empty((O, packed_adj.shape[1] * 2), np.uint8)
    codes[:, 0::2] = lo
    codes[:, 1::2] = hi
    top = codes[O // 2 :]
    bot = codes[: O // 2]
    return ((top << 4) | bot).astype(np.uint8)


def _outpair_to_plane(packed_op: np.ndarray) -> np.ndarray:
    """[O/2, K] output-pair-packed nibbles (INT4-AWQ layout,
    `quant_utils.py:790`: low nib = even row, high nib = odd row)
    -> [O/2, K] plane-packed bytes."""
    O2 = packed_op.shape[0]
    codes = np.empty((O2 * 2, packed_op.shape[1]), np.uint8)
    codes[0::2] = packed_op & 0xF
    codes[1::2] = (packed_op >> 4) & 0xF
    return ((codes[O2:] << 4) | codes[:O2]).astype(np.uint8)


def load_quantized_checkpoint(path: str) -> CompressedModel:
    """Build a CompressedModel from an exported checkpoint directory."""
    with open(os.path.join(path, "hf_quant_config.json")) as f:
        qc = json.load(f)["quantization"]
    with open(os.path.join(path, "config.json")) as f:
        cfg_d = json.load(f)
    cfg = hf_loader.config_from_hf(cfg_d)
    is_moe = cfg_d.get("model_type") in ("qwen3_moe", "mixtral")
    if is_moe:
        from ..models.mixtral import MixtralConfig

        E_ = cfg_d.get("num_experts", cfg_d.get("num_local_experts"))
        cfg = MixtralConfig(**{
            **cfg.__dict__,
            "intermediate_size": cfg_d.get("moe_intermediate_size",
                                           cfg_d["intermediate_size"]),
            "num_experts": E_,
            "top_k": cfg_d.get("num_experts_per_tok", 2),
            "norm_topk_prob": cfg_d.get("norm_topk_prob", True),
        })
    tensors = hf_export.load_exported(path)
    algo = qc["quant_algo"]
    # SVDQuant = base format + low-rank tensors; strip for weight decode
    base_algo = algo[: -len("_SVDQUANT")] if algo.endswith("_SVDQUANT") else algo
    L = cfg.num_hidden_layers

    def stack(fmt, dtype=None):
        arrs = [tensors[fmt.format(i=i)] for i in range(L)]
        out = jnp.stack([jnp.asarray(a) for a in arrs])
        return out.astype(dtype) if dtype else out

    layers: dict = {
        "input_layernorm": stack("model.layers.{i}.input_layernorm.weight", cfg.dtype),
        "post_attention_layernorm": stack(
            "model.layers.{i}.post_attention_layernorm.weight", cfg.dtype
        ),
    }
    kinds: dict[str, str] = {}
    qstate: dict = {}
    for name, hf_fmt in hf_export.PROJ_TO_HF.items():
        if is_moe and name.startswith("mlp."):
            continue  # MoE checkpoints carry experts instead
        base = hf_fmt + ".{suffix}"

        def t(i, suffix):
            return tensors[hf_fmt.format(i=i) + "." + suffix]

        if base_algo == "NVFP4":
            packed = np.stack([_adjacent_to_plane(t(i, "weight")) for i in range(L)])
            ws = np.stack([np.asarray(t(i, "weight_scale")) for i in range(L)])
            O2 = packed.shape[1]
            layers[name] = {
                "packed": jnp.asarray(packed),
                "scale_lo": jnp.asarray(ws[:, :O2]).astype(jnp.float8_e4m3fn)
                if ws.dtype != np.dtype("uint8") else jnp.asarray(ws[:, :O2]),
                "scale_hi": jnp.asarray(ws[:, O2:]).astype(jnp.float8_e4m3fn)
                if ws.dtype != np.dtype("uint8") else jnp.asarray(ws[:, O2:]),
                "global_scale": jnp.asarray(
                    np.stack([np.asarray(t(i, "weight_scale_2")).reshape(()) for i in range(L)])
                ),
            }
            kinds[name] = "nvfp4"
        elif base_algo in ("W4A16_AWQ", "W4A8_AWQ"):
            packed = np.stack([_outpair_to_plane(t(i, "weight")) for i in range(L)])
            ws = np.stack([np.asarray(t(i, "weight_scale")) for i in range(L)])
            O2 = packed.shape[1]
            layers[name] = {
                "packed": jnp.asarray(packed),
                "scale_lo": jnp.asarray(ws[:, :O2], dtype=np.float32),
                "scale_hi": jnp.asarray(ws[:, O2:], dtype=np.float32),
            }
            kinds[name] = "int4"
        elif base_algo == "FP8":
            layers[name] = {
                "q": stack(base.replace(".{suffix}", ".weight")),
                "scale": jnp.asarray(
                    np.stack([np.asarray(t(i, "weight_scale")).reshape(-1, 1)[:1] for i in range(L)])
                ),
            }
            kinds[name] = "fp8"
        elif base_algo in ("W8A8_SQ_PER_CHANNEL", "INT8"):
            layers[name] = {
                "q": stack(base.replace(".{suffix}", ".weight")),
                "scale": jnp.asarray(
                    np.stack([np.asarray(t(i, "weight_scale")).reshape(-1, 1) for i in range(L)])
                ),
            }
            kinds[name] = "int8"
        else:
            layers[name] = {"w": stack(base.replace(".{suffix}", ".weight"), cfg.dtype)}
            kinds[name] = "bf16"

        # SVDQuant low-rank branch rides the layer scan under __adapters__
        la_key = hf_fmt.format(i=0) + ".svdquant_lora_a"
        if la_key in tensors:
            A = jnp.stack([jnp.asarray(tensors[hf_fmt.format(i=i) + ".svdquant_lora_a"]) for i in range(L)])
            Bm = jnp.stack([jnp.asarray(tensors[hf_fmt.format(i=i) + ".svdquant_lora_b"]) for i in range(L)])
            layers.setdefault("__adapters__", {})[name] = {
                "A": A.astype(cfg.dtype), "B": Bm.astype(cfg.dtype),
                "scale": jnp.ones((L,), jnp.float32),
            }

        # activation-side state: pre_quant_scale + input_scale
        pqs_key = hf_fmt.format(i=0) + ".pre_quant_scale"
        if pqs_key in tensors:
            pqs = jnp.stack(
                [jnp.asarray(tensors[hf_fmt.format(i=i) + ".pre_quant_scale"]) for i in range(L)]
            )
            qstate.setdefault(name, {})["input"] = Q.QuantizerState(
                pre_quant_scale=pqs.astype(jnp.float32)
            )

    if is_moe:
        E = cfg.num_experts
        if cfg_d["model_type"] == "qwen3_moe":
            router_fmt = "model.layers.{i}.mlp.gate.weight"
            exp_base = "model.layers.{i}.mlp.experts.{e}.{p}"
            name_of = {"gate_proj": "gate_proj", "up_proj": "up_proj",
                       "down_proj": "down_proj"}
        else:  # mixtral naming
            router_fmt = "model.layers.{i}.block_sparse_moe.gate.weight"
            exp_base = "model.layers.{i}.block_sparse_moe.experts.{e}.{p}"
            name_of = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}
        layers["moe.router"] = stack(router_fmt, cfg.dtype)
        if "model.layers.0.self_attn.q_norm.weight" in tensors:
            layers["self_attn.q_norm"] = stack(
                "model.layers.{i}.self_attn.q_norm.weight", cfg.dtype)
            layers["self_attn.k_norm"] = stack(
                "model.layers.{i}.self_attn.k_norm.weight", cfg.dtype)
        for ours, hfp in (("moe.gate_proj", "gate_proj"),
                          ("moe.up_proj", "up_proj"),
                          ("moe.down_proj", "down_proj")):
            def te(i, e, suffix, _hfp=name_of[hfp]):
                return tensors[
                    exp_base.format(i=i, e=e, p=_hfp) + "." + suffix]

            if base_algo == "NVFP4":
                packed = np.stack([
                    np.stack([_adjacent_to_plane(te(i, e, "weight"))
                              for e in range(E)]) for i in range(L)])
                ws = np.stack([
                    np.stack([np.asarray(te(i, e, "weight_scale"))
                              for e in range(E)]) for i in range(L)])
                gs = np.stack([
                    np.stack([np.asarray(te(i, e, "weight_scale_2")).reshape(())
                              for e in range(E)]) for i in range(L)])
                O2 = packed.shape[2]
                sdtype = (jnp.float8_e4m3fn
                          if ws.dtype != np.dtype("uint8") else None)
                sl = jnp.asarray(ws[:, :, :O2])
                sh = jnp.asarray(ws[:, :, O2:])
                layers[ours] = {
                    "packed": jnp.asarray(packed),
                    "scale_lo": sl.astype(sdtype) if sdtype else sl,
                    "scale_hi": sh.astype(sdtype) if sdtype else sh,
                    "global_scale": jnp.asarray(gs),
                }
                kinds[ours] = "nvfp4"
            elif base_algo == "FP8":
                layers[ours] = {
                    "q": jnp.stack([
                        jnp.stack([jnp.asarray(te(i, e, "weight"))
                                   for e in range(E)]) for i in range(L)]),
                    "scale": jnp.asarray(np.stack([
                        np.stack([np.asarray(te(i, e, "weight_scale")).reshape(-1, 1)[:1]
                                  for e in range(E)]) for i in range(L)])),
                }
                kinds[ours] = "fp8"
            elif base_algo in ("W8A8_SQ_PER_CHANNEL", "INT8"):
                layers[ours] = {
                    "q": jnp.stack([
                        jnp.stack([jnp.asarray(te(i, e, "weight"))
                                   for e in range(E)]) for i in range(L)]),
                    "scale": jnp.asarray(np.stack([
                        np.stack([np.asarray(te(i, e, "weight_scale")).reshape(-1, 1)
                                  for e in range(E)]) for i in range(L)])),
                }
                kinds[ours] = "int8"
            else:
                raise NotImplementedError(
                    f"MoE deploy loading for {base_algo} not wired")

    params = {
        "embed_tokens": jnp.asarray(tensors["model.embed_tokens.weight"]).astype(cfg.dtype),
        "layers": layers,
        "norm": jnp.asarray(tensors["model.norm.weight"]).astype(cfg.dtype),
    }
    if "lm_head.weight" in tensors:
        params["lm_head"] = jnp.asarray(tensors["lm_head.weight"]).astype(cfg.dtype)

    # layout: act/KV quantizer configs from the recorded algo
    preset = {
        "NVFP4": "NVFP4_DEFAULT_CFG",
        "W4A16_AWQ": "INT4_AWQ_CFG",
        "W4A8_AWQ": "W4A8_AWQ_BETA_CFG",
        "FP8": "FP8_DEFAULT_CFG",
        "W8A8_SQ_PER_CHANNEL": "INT8_SMOOTHQUANT_CFG",
        "INT8": "INT8_DEFAULT_CFG",
        "MXFP4": "MXFP4_DEFAULT_CFG",
        "MXFP8": "MXFP8_DEFAULT_CFG",
    }.get(base_algo)
    if preset and is_moe:
        from ..models import mixtral as mixtral_mod

        layout = mixtral_mod.build_layout(cfg, get_preset(preset))
    elif preset:
        layout = llama.build_layout(cfg, get_preset(preset))
    else:
        layout = llama.QuantLayout(sites=())
    # amax state for static act quantizers from input_scale
    for name, hf_fmt in hf_export.PROJ_TO_HF.items():
        icfg = layout.get(f"{name}.input")
        key0 = hf_fmt.format(i=0) + ".input_scale"
        if icfg.enable and not icfg.dynamic and key0 in tensors:
            div = 6.0 * 448.0 if base_algo == "NVFP4" else (448.0 if icfg.is_fp else 127.0)
            amax = jnp.stack(
                [jnp.asarray(tensors[hf_fmt.format(i=i) + ".input_scale"]).reshape(()) * div
                 for i in range(L)]
            )
            sub = qstate.setdefault(name, {})
            ist = sub.get("input", Q.QuantizerState())
            sub["input"] = ist.replace(amax=amax)
    if is_moe:
        icfg = layout.get("moe.gate_proj.input")
        key_fmt = exp_base.format(i="{i}", e=0, p=name_of["gate_proj"])             + ".input_scale"
        if icfg.enable and not icfg.dynamic and key_fmt.format(i=0) in tensors:
            div = 6.0 * 448.0 if base_algo == "NVFP4" else (
                448.0 if icfg.is_fp else 127.0)
            amax = jnp.stack([
                jnp.asarray(tensors[key_fmt.format(i=i)]).reshape(()) * div
                for i in range(L)])
            qstate.setdefault("moe.gate_proj", {})["input"] = Q.QuantizerState(
                amax=amax)
    return CompressedModel(cfg, params, kinds, layout, qstate,
                           adapters=layers.get("__adapters__"))
