"""Unified HF checkpoint export (`export_hf_checkpoint` equivalent).

Re-creates the reference's unified export (`unified_export_hf.py:1527` +
`quant_utils.py`): packed quantized weights + per-format scales in the HF
naming scheme, an `hf_quant_config.json` describing the format, and a
sanitized `config.json` — deployable to engines that read ModelOpt unified
checkpoints (TRT-LLM/vLLM/SGLang readers).

Shared-input fusion note: the reference resmooths/unifies amax across
QKV and gate/up at export (`requantize_resmooth_fused_llm_layers:433`). In
this framework those sites collect from the *same* captured tensor with the
same running-max, so their amax/pre_quant_scale are identical by
construction — no resmoothing pass is needed.

Export layouts follow the reference exactly:
 - NVFP4 values pack two *adjacent* elements per byte along the input
   dim: (q[..., 1::2] << 4) | q[..., 0::2] (`nvfp4_tensor.py:337`).
 - INT4-AWQ / W4A8-AWQ pack pairs of *output channels* per byte producing
   [O/2, K]: byte[o2, k] = nib(q[2*o2, k]) | nib(q[2*o2+1, k]) << 4
   (`quant_utils.py:790` pack_int4_in_uint8 — transpose to [K, O], group
   output pairs, pack val0 | val1 << 4, transpose back).
   (The serving engine uses plane packing internally; export re-packs.)
 - W4A8-AWQ additionally emits `weight_scale_2` = fp8-stage amax/448
   (`quant_utils.py:343` — the deploy kernel dequantizes int4 to fp8 range).
 - NVFP4: `weight_scale` = per-block E4M3, `weight_scale_2` = fp32
   global_amax / (6*448); `input_scale` = act_amax / (6*448).
 - FP8: `weight_scale` = amax/448 fp32, weights stored float8_e4m3fn.
 - INT8-SQ: per-channel `weight_scale`, `input_scale` per-tensor,
   `pre_quant_scale` on the activation side.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import hf_loader, llama
from ..ops import numerics
from ..quant import quantizer as Q
from ..quant.ptq import QuantizedModel

PROJ_TO_HF = {
    "self_attn.q_proj": "model.layers.{i}.self_attn.q_proj",
    "self_attn.k_proj": "model.layers.{i}.self_attn.k_proj",
    "self_attn.v_proj": "model.layers.{i}.self_attn.v_proj",
    "self_attn.o_proj": "model.layers.{i}.self_attn.o_proj",
    "mlp.gate_proj": "model.layers.{i}.mlp.gate_proj",
    "mlp.up_proj": "model.layers.{i}.mlp.up_proj",
    "mlp.down_proj": "model.layers.{i}.mlp.down_proj",
}


def _pack_adjacent_nibbles(codes: np.ndarray) -> np.ndarray:
    """(q[..., 1::2] << 4) | q[..., 0::2] — NVFP4 export layout
    (`nvfp4_tensor.py:337`): adjacent input-dim elements share a byte."""
    lo = codes[..., 0::2]
    hi = codes[..., 1::2]
    return ((hi << 4) | (lo & 0xF)).astype(np.uint8)


def _pack_outpair_nibbles(codes: np.ndarray) -> np.ndarray:
    """INT4-AWQ layout (`quant_utils.py:790` pack_int4_in_uint8):
    pairs of output channels share a byte -> [..., O/2, K];
    low nibble = even output row, high nibble = odd output row."""
    lo = codes[..., 0::2, :]
    hi = codes[..., 1::2, :]
    return (((hi & 0xF) << 4) | (lo & 0xF)).astype(np.uint8)


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _nvfp4_quant_pack(w32: jax.Array, gs: float, bsz: int):
    """One fused device pass: per-block E4M3 scales + fp4 rounding + adjacent
    nibble packing. Keeps the 70B streaming export compute-bound on XLA
    instead of numpy (the np<->jnp ping-pong was ~10x slower per layer)."""
    bam = jnp.max(jnp.abs(w32).reshape(w32.shape[0], -1, bsz), axis=-1)
    s_val = numerics.cast_e4m3(bam / (6.0 * gs))
    s_val = jnp.where(s_val <= 0, 1.0, s_val)
    sb_full = jnp.repeat(s_val * gs, bsz, axis=-1)
    qv = numerics.fp4_round(w32 / sb_full)
    codes = numerics.fp4_to_codes(qv).astype(jnp.uint8)
    lo = codes[..., 0::2]
    hi = codes[..., 1::2]
    packed = (hi << 4) | (lo & 0xF)
    s8 = jnp.clip(s_val, -448, 448).astype(jnp.float8_e4m3fn)
    return packed, s8


@partial(jax.jit, static_argnums=(2,))
def _int4_quant_pack(w32: jax.Array, bam: jax.Array, bsz: int):
    """Fused int4 block quant + output-pair nibble packing (AWQ layout)."""
    scale = jnp.where(bam == 0, 1.0, bam / 7.0)
    s_full = jnp.repeat(scale, bsz, axis=-1)
    q = jnp.clip(jnp.round(w32 / s_full), -8, 7).astype(jnp.int32) & 0xF
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    packed = (((hi & 0xF) << 4) | (lo & 0xF)).astype(jnp.uint8)
    return packed, scale.astype(jnp.float32)


def _quant_algo(model: QuantizedModel) -> tuple[str, Optional[int]]:
    wcfg = model.layout.get("mlp.down_proj.weight")
    if not wcfg.enable:  # MoE families carry the format on the expert site
        moe = model.layout.get("moe.down_proj.weight")
        if moe.enable:
            wcfg = moe
    base = wcfg.sequential[0] if wcfg.sequential else wcfg
    if not wcfg.enable:
        return "NONE", None
    # MX formats (E8M0 block scales) must be checked before the NVFP4/FP8
    # branches: MXFP4 shares num_bits (2,1) with NVFP4 and MXFP8 shares
    # (4,3) with FP8, differing only in scale_bits (reference distinguishes
    # them the same way, quant_utils.py:560-575).
    if base.is_fp and base.block is not None and base.block.scale_bits == (8, 0):
        bsz = dict(base.block.sizes).get(-1, 32)
        if base.num_bits == (2, 1):
            return "MXFP4", bsz
        if base.num_bits == (4, 3):
            return "MXFP8", bsz
        return "NONE", None
    if base.is_fp and base.num_bits == (2, 1):
        bsz = dict(base.block.sizes).get(-1, 16) if base.block else 16
        # SVDQuant: low-rank residual branch present (quant_utils.py:553)
        if model.adapters:
            return "NVFP4_SVDQUANT", bsz
        return "NVFP4", bsz
    if base.is_fp and base.num_bits == (4, 3):
        return "FP8", None
    if not base.is_fp and base.num_bits == 4:
        bsz = dict(base.block.sizes).get(-1, 128) if base.block else 128
        if wcfg.sequential:
            return "W4A8_AWQ", bsz
        return "W4A16_AWQ", bsz
    if not base.is_fp and base.num_bits == 8:
        algo = model.quant_cfg.algorithm
        method = algo.get("method") if isinstance(algo, dict) else algo
        if method == "smoothquant":
            return "W8A8_SQ_PER_CHANNEL", None
        return "INT8", None
    return "NONE", None


def _kv_algo(model: QuantizedModel) -> Optional[str]:
    kcfg = model.layout.get("self_attn.k_bmm")
    if not kcfg.enable:
        return None
    if kcfg.is_fp and kcfg.num_bits == (4, 3):
        return "FP8"
    if kcfg.is_fp and kcfg.num_bits == (2, 1):
        return "NVFP4"
    if not kcfg.is_fp and kcfg.num_bits == 8:
        return "INT8"
    return None


def _export_weight(w, wcfg, wst, algo: str):
    """Returns {suffix: np.ndarray} for one projection weight [O, K]."""
    w32 = np.asarray(w, dtype=np.float32)
    out: dict[str, np.ndarray] = {}
    if algo == "NONE" or not wcfg.enable:
        out["weight"] = w32.astype(np.float16)
        return out
    base = wcfg.sequential[0] if wcfg.sequential else wcfg
    amax = wst.amax if wst is not None else None
    amax_tuple = amax if isinstance(amax, tuple) else None
    if isinstance(amax, tuple):
        amax = amax[0]

    if algo == "NVFP4":
        bsz = dict(base.block.sizes).get(-1, 16)
        g_amax = np.asarray(amax) if amax is not None else np.abs(w32).max()
        gs = max(float(g_amax) / (6.0 * 448.0), 1e-12)
        packed, s8 = _nvfp4_quant_pack(jnp.asarray(w32), float(gs), bsz)
        out["weight"] = np.asarray(packed)
        out["weight_scale"] = np.asarray(s8)
        out["weight_scale_2"] = np.asarray(gs, dtype=np.float32)
        return out

    if algo == "FP8":
        a = np.asarray(amax) if amax is not None else np.abs(w32).max()
        scale = np.maximum(np.asarray(a, np.float32), 1e-12) / 448.0
        qw = np.asarray(
            jnp.clip(jnp.asarray(w32 / scale.reshape((-1, 1) if scale.ndim else ())),
                     -448, 448).astype(jnp.float8_e4m3fn)
        )
        out["weight"] = qw
        out["weight_scale"] = scale.astype(np.float32)
        return out

    if algo in ("W4A16_AWQ", "W4A8_AWQ"):
        bsz = dict(base.block.sizes).get(-1, 128)
        bsz = min(bsz, w32.shape[-1])
        if amax is None:
            bam = np.abs(w32).reshape(w32.shape[0], -1, bsz).max(axis=-1)
        else:
            bam = np.asarray(amax, np.float32)
        packed, scale = _int4_quant_pack(
            jnp.asarray(w32), jnp.asarray(bam, jnp.float32), bsz
        )
        out["weight"] = np.asarray(packed)
        out["weight_scale"] = np.asarray(scale)
        if algo == "W4A8_AWQ":
            # Second-level scale: fp8-stage amax/448 (quant_utils.py:343) —
            # the deploy kernel dequantizes int4 to fp8 range.
            fa = amax_tuple[-1] if amax_tuple is not None else np.abs(w32).max()
            out["weight_scale_2"] = np.asarray(
                np.maximum(np.asarray(fa, np.float32).max(), 1e-12) / 448.0,
                np.float32,
            )
        return out

    if algo in ("MXFP4", "MXFP8"):
        # MX formats: export the fake-quantized weight (values are exact MX
        # grid points, per-32-block E8M0 scaled) in fp16. A packed MX byte
        # layout is not part of the unified-HF contract we target.
        bsz = dict(base.block.sizes).get(-1, 32)
        e, m = base.num_bits
        wq = np.asarray(
            numerics.fake_quant_mx(jnp.asarray(w32), e, m, min(bsz, w32.shape[-1]))
        )
        out["weight"] = wq.astype(np.float16)
        return out

    # INT8 per-channel
    a = np.asarray(amax) if amax is not None else np.abs(w32).max(axis=-1, keepdims=True)
    scale = np.where(a == 0, 1.0, a / 127.0).astype(np.float32)
    q = np.clip(np.round(w32 / scale), -128, 127).astype(np.int8)
    out["weight"] = q
    out["weight_scale"] = scale
    return out


def _save_safetensors_with_fp8(tensors: dict[str, np.ndarray], path: str) -> None:
    """Save via safetensors-torch: the numpy backend lacks float8 support,
    and real float8 storage is what deployment engines read."""
    import torch
    from safetensors.torch import save_file

    cooked = {}
    for k, v in tensors.items():
        if v.dtype.name == "float8_e4m3fn":
            t = torch.from_numpy(np.ascontiguousarray(v.view(np.uint8))).view(torch.float8_e4m3fn)
        else:
            t = torch.from_numpy(np.ascontiguousarray(v))
        cooked[k] = t
    save_file(cooked, path)


class LazyExported:
    """Dict-like lazy view over an exported checkpoint (single-file or
    sharded). Tensors are fetched from `safetensors` on access — the file is
    mmapped, so host RSS stays bounded by what the caller actually touches
    (the streaming-load counterpart of `unified_export_hf_streaming.py:445`).
    """

    def __init__(self, path: str):
        self._path = path
        index = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index):
            with open(index) as f:
                self._weight_map = json.load(f)["weight_map"]
        else:
            from safetensors import safe_open

            single = os.path.join(path, "model.safetensors")
            with safe_open(single, framework="pt") as sf:
                self._weight_map = {k: "model.safetensors" for k in sf.keys()}
        self._handles: dict[str, Any] = {}

    def _handle(self, fname: str):
        if fname not in self._handles:
            from safetensors import safe_open

            self._handles[fname] = safe_open(
                os.path.join(self._path, fname), framework="pt"
            )
        return self._handles[fname]

    def keys(self):
        return self._weight_map.keys()

    def __contains__(self, k):
        return k in self._weight_map

    def __iter__(self):
        return iter(self._weight_map)

    def __len__(self):
        return len(self._weight_map)

    def __getitem__(self, k: str) -> np.ndarray:
        import torch

        import ml_dtypes

        t = self._handle(self._weight_map[k]).get_tensor(k)
        if t.dtype == torch.float8_e4m3fn:
            return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e4m3fn)
        if t.dtype == torch.bfloat16:
            return t.float().numpy()
        return t.numpy()

    def items(self):
        for k in self._weight_map:
            yield k, self[k]


def load_exported(path: str) -> LazyExported:
    """Read back an exported checkpoint (fp8 tensors come back as ml_dtypes).

    Returns a lazy dict-like view; index over keys and fetch on demand."""
    return LazyExported(path)


def _iter_export_tensors(model: QuantizedModel):
    """Yield (name, np.ndarray) for the unified checkpoint, layer-at-a-time.

    This is the streaming spine of the export: only one layer's tensors are
    ever materialized on host at once (the reference's
    `unified_export_hf_streaming.py:445` streams per-layer the same way so a
    70B export never holds the full state dict)."""
    cfg = model.model_cfg
    algo, _ = _quant_algo(model)
    kv_algo = _kv_algo(model)
    L = cfg.num_hidden_layers

    def to_np16(a):
        return np.asarray(jnp.asarray(a).astype(jnp.float32), dtype=np.float16)

    yield "model.embed_tokens.weight", to_np16(model.params["embed_tokens"])
    yield "model.norm.weight", to_np16(model.params["norm"])
    if "lm_head" in model.params:
        yield "lm_head.weight", to_np16(model.params["lm_head"])
    layers = model.params["layers"]
    is_moe = "moe.gate_proj" in layers
    unsupported = [k for k in layers if k.startswith("shared.")
                   or (k.endswith("__bias") and not k.startswith("self_attn."))
                   or k == "self_attn.sinks"]
    if unsupported:
        raise NotImplementedError(
            f"unified export does not yet cover these leaves: {unsupported}; "
            "use opt.state save/restore for this family")
    for i in range(L):
        yield f"model.layers.{i}.input_layernorm.weight", to_np16(
            layers["input_layernorm"][i]
        )
        yield f"model.layers.{i}.post_attention_layernorm.weight", to_np16(
            layers["post_attention_layernorm"][i]
        )
        if "self_attn.q_norm" in layers:  # Qwen3-style per-head norms
            yield f"model.layers.{i}.self_attn.q_norm.weight", to_np16(
                layers["self_attn.q_norm"][i])
            yield f"model.layers.{i}.self_attn.k_norm.weight", to_np16(
                layers["self_attn.k_norm"][i])
        for bname in sorted(k for k in layers
                            if k.startswith("self_attn.") and k.endswith("__bias")):
            proj = bname[: -len("__bias")]  # qwen2-style attention biases
            yield f"model.layers.{i}.{proj}.bias", to_np16(layers[bname][i])
        for name, hf_fmt in PROJ_TO_HF.items():
            if name not in layers:  # MoE families have no dense mlp
                continue
            prefix = hf_fmt.format(i=i)
            wcfg = model.layout.get(f"{name}.weight")
            site = model.qstate.get(name, {})
            wst_all = site.get("weight")
            wst = jax.tree.map(lambda a: a[i], wst_all) if wst_all is not None else None
            exported = _export_weight(
                layers[name][i], wcfg, wst,
                algo[: -len("_SVDQUANT")] if algo.endswith("_SVDQUANT") else algo,
            )
            for suffix, arr in exported.items():
                yield f"{prefix}.{suffix}", arr
            # SVDQuant low-rank factors (`<module>.svdquant_lora_{a,b}`,
            # convert_hf_config.py:214); adapter scale folds into lora_b.
            if model.adapters and name in model.adapters:
                ad = model.adapters[name]
                yield f"{prefix}.svdquant_lora_a", to_np16(ad["A"][i])
                yield f"{prefix}.svdquant_lora_b", to_np16(
                    jnp.asarray(ad["B"][i]).astype(jnp.float32) * ad["scale"][i]
                )
            # activation scales
            ist_all = site.get("input")
            icfg = model.layout.get(f"{name}.input")
            if ist_all is not None:
                ist = jax.tree.map(lambda a: a[i], ist_all)
                if ist.amax is not None and icfg.enable:
                    a = np.asarray(ist.amax, np.float32).max()
                    div = 6.0 * 448.0 if algo.startswith("NVFP4") else (
                        448.0 if icfg.is_fp else 127.0
                    )
                    yield f"{prefix}.input_scale", np.asarray(a / div, np.float32)
                if ist.pre_quant_scale is not None:
                    yield f"{prefix}.pre_quant_scale", np.asarray(
                        ist.pre_quant_scale, np.float32
                    )
        if is_moe:
            # Stacked experts unstack into per-expert HF modules in the
            # naming convention of the DECLARED model_type (config_to_hf:
            # qwen3_moe for qk_norm configs, mixtral otherwise) so the
            # directory is self-consistent. The reference's fused-MoE
            # plugins quantize the same modules
            # (`quantization/plugins/huggingface.py:593-751`).
            if cfg.qk_norm:
                router_name = f"model.layers.{i}.mlp.gate.weight"
                exp_prefix = f"model.layers.{i}.mlp.experts"
                proj_names = {"moe.gate_proj": "gate_proj",
                              "moe.up_proj": "up_proj",
                              "moe.down_proj": "down_proj"}
            else:
                router_name = f"model.layers.{i}.block_sparse_moe.gate.weight"
                exp_prefix = f"model.layers.{i}.block_sparse_moe.experts"
                proj_names = {"moe.gate_proj": "w1", "moe.up_proj": "w3",
                              "moe.down_proj": "w2"}
            yield router_name, to_np16(layers["moe.router"][i])
            ist_all = model.qstate.get("moe.gate_proj", {}).get("input")
            icfg = model.layout.get("moe.gate_proj.input")
            in_scale = None
            if ist_all is not None:
                ist = jax.tree.map(lambda a: a[i], ist_all)
                if ist.amax is not None and icfg.enable:
                    a = np.asarray(ist.amax, np.float32).max()
                    div = 6.0 * 448.0 if algo.startswith("NVFP4") else (
                        448.0 if icfg.is_fp else 127.0)
                    in_scale = np.asarray(a / div, np.float32)
            E = layers["moe.gate_proj"].shape[1]
            for name, hfn in proj_names.items():
                wcfg = model.layout.get(f"{name}.weight")
                wst_all = model.qstate.get(name, {}).get("weight")
                for e in range(E):
                    wst = (jax.tree.map(lambda a: a[i, e], wst_all)
                           if wst_all is not None else None)
                    exported = _export_weight(layers[name][i, e], wcfg, wst, algo)
                    prefix = f"{exp_prefix}.{e}.{hfn}"
                    for suffix, arr in exported.items():
                        yield f"{prefix}.{suffix}", arr
                    if in_scale is not None:
                        # experts share the block's input activation
                        yield f"{prefix}.input_scale", in_scale
        # KV scales (`get_kv_cache_scaling_factor`, quant_utils.py:371)
        if kv_algo:
            for which in ("k", "v"):
                st_all = model.qstate.get(f"self_attn.{which}_bmm")
                if st_all is not None and st_all.amax is not None:
                    a = float(np.asarray(st_all.amax[i], np.float32).max())
                    div = 448.0 if kv_algo == "FP8" else (127.0 if kv_algo == "INT8" else 6.0 * 448.0)
                    scale = a / div
                    if kv_algo == "FP8":
                        # Reference clamps FP8 KV scales to >= 1.0 and warns on
                        # large activations (get_kv_cache_scaling_factor,
                        # quant_utils.py:390-404).
                        if scale > 0.5:
                            import warnings

                            warnings.warn(
                                f"Large KV activation detected: {scale}; quantized "
                                "KV cache may lead to higher accuracy drop."
                            )
                        scale = max(scale, 1.0)
                    yield (
                        f"model.layers.{i}.self_attn.{which}_proj.{which}_scale",
                        np.asarray(scale, np.float32),
                    )


def _write_sharded(it, export_dir: str, max_shard_bytes: int) -> None:
    """Stream (name, arr) pairs into HF-style shards + index.json.

    Peak host memory = one shard's tensors (+ one in-flight layer), never the
    full state dict. Shards are written under temp names and renamed once the
    total count is known (the `-of-NNNNN` suffix needs it)."""
    shard: dict[str, np.ndarray] = {}
    shard_bytes = 0
    shard_files: list[str] = []
    weight_map: dict[str, str] = {}
    pending: list[str] = []
    total = 0

    def flush():
        nonlocal shard, shard_bytes
        if not shard:
            return
        tmp = f"__shard_{len(shard_files):05d}.safetensors"
        _save_safetensors_with_fp8(shard, os.path.join(export_dir, tmp))
        shard_files.append(tmp)
        for k in shard:
            weight_map[k] = tmp
        shard = {}
        shard_bytes = 0

    for name, arr in it:
        if shard_bytes + arr.nbytes > max_shard_bytes and shard:
            flush()
        # own the buffer: relay staging buffers can be recycled by later
        # transfers while the shard is still accumulating
        shard[name] = np.array(arr, copy=True)
        shard_bytes += arr.nbytes
        total += arr.nbytes
    flush()

    n = len(shard_files)
    final = [f"model-{i + 1:05d}-of-{n:05d}.safetensors" for i in range(n)]
    for tmp, fin in zip(shard_files, final):
        os.replace(os.path.join(export_dir, tmp), os.path.join(export_dir, fin))
    rename = dict(zip(shard_files, final))
    index = {
        "metadata": {"total_size": total},
        "weight_map": {k: rename[v] for k, v in weight_map.items()},
    }
    with open(os.path.join(export_dir, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f, indent=2)


def _mxfp4_pack_hf(w: jax.Array) -> tuple[np.ndarray, np.ndarray]:
    """Quantize [rows, K] to HF's native GPT-OSS MXFP4 layout.

    Returns (blocks [rows, K/32, 16] uint8 — two E2M1 codes per byte, lo
    nibble = even element — and scales [rows, K/32] uint8 biased-127 E8M0),
    the exact format `transformers.integrations.mxfp4.
    convert_moe_packed_tensors` dequantizes."""
    rows, K = w.shape
    w32 = jnp.asarray(w).astype(jnp.float32)
    bam = numerics.block_amax_compact(w32, ((-1, 32),))
    from ..ops.formats import fp_emax

    scale = numerics.e8m0_scale(bam, fp_emax(2, 1))
    s_full = numerics.expand_block_scale(scale, w32.shape, ((-1, 32),))
    codes = numerics.fp4_to_codes(numerics.fp4_round(w32 / s_full))
    codes = codes.astype(jnp.uint8)
    by = (codes[..., 0::2] | (codes[..., 1::2] << 4)).reshape(rows, K // 32, 16)
    _, fe = jnp.frexp(scale)
    exps = jnp.clip(fe - 1 + 127, 0, 254).astype(jnp.uint8)
    return np.asarray(by).copy(), np.asarray(exps).copy()


def export_gpt_oss_checkpoint(model: QuantizedModel, export_dir: str,
                              max_shard_bytes: Optional[int] = None) -> dict:
    """GPT-OSS unified export in the architecture's NATIVE shipped format:
    experts re-fuse to `gate_up_proj_blocks/scales` + `down_proj_blocks/
    scales` (MXFP4, blocks along the contraction dim), everything else
    passes through bf16 with HF names — the produced directory round-trips
    through `hf_loader.load_hf_moe_checkpoint` AND transformers' mxfp4
    dequant path. Requires an MXFP4 weight preset (the format the released
    checkpoints use)."""
    cfg = model.model_cfg
    algo, group = _quant_algo(model)
    if algo != "MXFP4":
        raise NotImplementedError(
            f"GPT-OSS export writes the native MXFP4 format; got {algo}. "
            "Quantize with MXFP4_DEFAULT_CFG/MXFP4_WEIGHT_ONLY_CFG.")
    os.makedirs(export_dir, exist_ok=True)

    def _iter():
        """Layer-at-a-time tensor stream (the streaming spine, same rule as
        `_iter_export_tensors`: host memory never holds the full model)."""
        layers = model.params["layers"]
        L, E = cfg.num_hidden_layers, cfg.num_experts
        inter, h = cfg.intermediate_size, cfg.hidden_size

        def to_np16(a):
            return np.asarray(jnp.asarray(a).astype(jnp.float32), dtype=np.float16)

        yield "model.embed_tokens.weight", to_np16(model.params["embed_tokens"])
        yield "model.norm.weight", to_np16(model.params["norm"])
        if "lm_head" in model.params:
            yield "lm_head.weight", to_np16(model.params["lm_head"])
        for i in range(L):
            p = f"model.layers.{i}."
            yield p + "input_layernorm.weight", to_np16(layers["input_layernorm"][i])
            yield p + "post_attention_layernorm.weight", to_np16(
                layers["post_attention_layernorm"][i])
            yield p + "self_attn.sinks", to_np16(layers["self_attn.sinks"][i])
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                yield p + f"self_attn.{proj}.weight", to_np16(
                    layers[f"self_attn.{proj}"][i])
                yield p + f"self_attn.{proj}.bias", to_np16(
                    layers[f"self_attn.{proj}__bias"][i])
            yield p + "mlp.router.weight", to_np16(layers["moe.router"][i])
            yield p + "mlp.router.bias", to_np16(layers["moe.router__bias"][i])
            # re-fuse gate/up (ours [E, I, H]) into interleaved [E, 2I, H]
            gate = jnp.asarray(layers["moe.gate_proj"][i], jnp.float32)
            up = jnp.asarray(layers["moe.up_proj"][i], jnp.float32)
            gu = jnp.stack([gate, up], axis=-2).reshape(E, 2 * inter, h)
            pe = [_mxfp4_pack_hf(gu[e]) for e in range(E)]
            yield p + "mlp.experts.gate_up_proj_blocks", np.stack([b for b, _ in pe])
            yield p + "mlp.experts.gate_up_proj_scales", np.stack([s_ for _, s_ in pe])
            gub = jnp.stack([layers["moe.gate_proj__bias"][i],
                             layers["moe.up_proj__bias"][i]], axis=-1)
            yield p + "mlp.experts.gate_up_proj_bias", to_np16(
                gub.reshape(E, 2 * inter))
            # HF down_proj blocks quantize along its contraction dim I, so
            # the packed rows are the H outputs — exactly our [E, H, I]
            down_rows = jnp.asarray(layers["moe.down_proj"][i], jnp.float32)
            pe = [_mxfp4_pack_hf(down_rows[e]) for e in range(E)]
            yield p + "mlp.experts.down_proj_blocks", np.stack([b for b, _ in pe])
            yield p + "mlp.experts.down_proj_scales", np.stack([s_ for _, s_ in pe])
            yield p + "mlp.experts.down_proj_bias", to_np16(
                layers["moe.down_proj__bias"][i])

    if max_shard_bytes is not None:
        _write_sharded(_iter(), export_dir, max_shard_bytes)
    else:
        tensors = {k: np.array(v, copy=True) for k, v in _iter()}
        _save_safetensors_with_fp8(tensors, os.path.join(export_dir, "model.safetensors"))

    hf_quant_config = {
        "producer": {"name": "tensorrt_model_optimizer_tpu", "version": "0.1.0"},
        "quantization": {"quant_algo": "MXFP4", "group_size": 32,
                         "exclude_modules": ["lm_head"]},
    }
    with open(os.path.join(export_dir, "hf_quant_config.json"), "w") as f:
        json.dump(hf_quant_config, f, indent=2)
    hf_cfg = {
        "architectures": ["GptOssForCausalLM"], "model_type": "gpt_oss",
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.hd, "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "max_position_embeddings": cfg.max_position_embeddings,
        "num_local_experts": cfg.num_experts,
        "num_experts_per_tok": cfg.top_k,
        "sliding_window": cfg.sliding_window,
        "layer_types": list(cfg.resolved_layer_types()),
        "attention_bias": cfg.attention_bias,
        "quantization_config": {"quant_method": "mxfp4",
                                "modules_to_not_convert": []},
        "torch_dtype": "bfloat16",
    }
    if cfg.rope_scaling is not None:
        hf_cfg["rope_scaling"] = hf_loader.config_to_hf(cfg)["rope_scaling"]
    with open(os.path.join(export_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return hf_quant_config


def export_hf_checkpoint(
    model: QuantizedModel, export_dir: str, max_shard_bytes: Optional[int] = None
) -> dict:
    """Write the unified quantized HF checkpoint. Returns hf_quant_config.

    With `max_shard_bytes` set, streams layer-at-a-time into HF-style shards
    (`model-XXXXX-of-NNNNN.safetensors` + `model.safetensors.index.json`) so
    host memory never holds the full state dict — the 70B-scale path
    (reference: `unified_export_hf_streaming.py:445`). Without it, writes a
    single `model.safetensors` with identical tensors."""
    from ..models.gpt_oss import GptOssConfig

    if isinstance(model.model_cfg, GptOssConfig):
        # GPT-OSS ships MXFP4 natively — write that format back
        return export_gpt_oss_checkpoint(model, export_dir, max_shard_bytes)
    os.makedirs(export_dir, exist_ok=True)
    cfg = model.model_cfg
    algo, group_size = _quant_algo(model)
    kv_algo = _kv_algo(model)

    if max_shard_bytes is not None:
        _write_sharded(_iter_export_tensors(model), export_dir, max_shard_bytes)
    else:
        tensors = {
            k: np.array(v, copy=True) for k, v in _iter_export_tensors(model)
        }
        _save_safetensors_with_fp8(
            tensors, os.path.join(export_dir, "model.safetensors")
        )

    hf_quant_config = {
        "producer": {"name": "tensorrt_model_optimizer_tpu", "version": "0.1.0"},
        "quantization": {
            "quant_algo": algo,
            "kv_cache_quant_algo": kv_algo,
            **({"group_size": group_size} if group_size else {}),
            **({"lora_rank": int(next(iter(model.adapters.values()))["A"].shape[1])}
               if model.adapters else {}),
            "exclude_modules": ["lm_head"],
        },
    }
    with open(os.path.join(export_dir, "hf_quant_config.json"), "w") as f:
        json.dump(hf_quant_config, f, indent=2)
    hf_cfg = hf_loader.config_to_hf(cfg)
    hf_cfg["quantization_config"] = hf_quant_config["quantization"]
    with open(os.path.join(export_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return hf_quant_config


def export_vlm_checkpoint(cfg, params, layout, qstate, export_dir: str,
                          quant_cfg=None) -> dict:
    """Unified export for the VLM family (`models/vlm.py`) in the LLaVA HF
    naming scheme: `language_model.*` (the LM tower through the standard
    unified exporter), `vision_tower.blocks.{i}.*` and
    `multi_modal_projector.*` (per-site packed weights via the same
    `_export_weight` format handlers). Reference analog: `examples/
    vlm_ptq` exporting the quantized VLM through `unified_export_hf`.

    Returns hf_quant_config. `quant_cfg` (QuantizeConfig or preset name)
    provides the algo tag; defaults to reading it from the LM layout via a
    QuantizedModel view."""
    from ..models import vlm as vlm_mod
    from ..quant.config import get_preset
    from ..quant.ptq import QuantizedModel

    os.makedirs(export_dir, exist_ok=True)
    qcfg = (get_preset(quant_cfg) if isinstance(quant_cfg, str)
            else quant_cfg)
    lm_state = {k: v for k, v in (qstate or {}).items()
                if not (k.startswith("vision.") or k.startswith("proj."))}
    lm_model = QuantizedModel(cfg.lm, params["lm"], layout, lm_state,
                              qcfg)
    algo, group_size = _quant_algo(lm_model)
    kv_algo = _kv_algo(lm_model)

    tensors = {
        f"language_model.{k}": np.array(v, copy=True)
        for k, v in _iter_export_tensors(lm_model)
    }
    # vision tower + projector: per-site format handlers on stacked blocks
    v = cfg.vision
    vp = params["vision"]
    for name in vlm_mod.VISION_PROJ:
        wcfg = layout.get(f"vision.{name}.weight")
        wst_all = (qstate or {}).get(f"vision.{name}", {}).get("weight")
        for i in range(v.depth):
            wst = (jax.tree.map(lambda a: a[i], wst_all)
                   if wst_all is not None else None)
            pieces = _export_weight(vp["blocks"][name][i], wcfg, wst, algo)
            for suf, arr in pieces.items():
                tensors[f"vision_tower.blocks.{i}.{name}.{suf}"] = arr
            tensors[f"vision_tower.blocks.{i}.{name}.bias"] = np.asarray(
                vp["blocks"][name + "__bias"][i], np.float16)
    tensors["vision_tower.patch_embed.weight"] = np.asarray(
        vp["patch_embed"], np.float16)
    tensors["vision_tower.pos_embed"] = np.asarray(vp["pos_embed"], np.float16)
    tensors["vision_tower.ln_f.weight"] = np.asarray(vp["ln_f"], np.float16)
    for i, name in enumerate(("fc1", "fc2"), start=1):
        wcfg = layout.get(f"proj.{name}.weight")
        wst = (qstate or {}).get(f"proj.{name}", {}).get("weight")
        pieces = _export_weight(params["proj"][name], wcfg, wst, algo)
        for suf, arr in pieces.items():
            tensors[f"multi_modal_projector.linear_{i}.{suf}"] = arr

    _save_safetensors_with_fp8(
        tensors, os.path.join(export_dir, "model.safetensors"))
    hf_quant_config = {
        "producer": {"name": "tensorrt_model_optimizer_tpu", "version": "0.1.0"},
        "quantization": {
            "quant_algo": algo,
            "kv_cache_quant_algo": kv_algo,
            **({"group_size": group_size} if group_size else {}),
            "exclude_modules": ["lm_head"],
        },
    }
    with open(os.path.join(export_dir, "hf_quant_config.json"), "w") as f:
        json.dump(hf_quant_config, f, indent=2)
    hf_cfg = hf_loader.config_to_hf(cfg.lm)
    hf_cfg["model_type"] = "llava-style-vlm"
    hf_cfg["vision_config"] = {
        "img_size": v.img_size, "patch_size": v.patch_size,
        "hidden_size": v.hidden_size, "depth": v.depth,
        "num_heads": v.num_heads,
    }
    hf_cfg["quantization_config"] = hf_quant_config["quantization"]
    with open(os.path.join(export_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return hf_quant_config
