"""Speculative-draft export (`export/plugins/hf_spec_export.py` analog).

Saves Medusa head / EAGLE draft weights as a standalone deployable checkpoint
(safetensors + config.json describing the draft architecture), next to or
independent of the base model's unified checkpoint.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..models import hf_loader, llama


def _save(tensors: dict[str, np.ndarray], path: str):
    from safetensors.numpy import save_file

    cooked = {}
    for k, v in tensors.items():
        a = np.asarray(v)
        if a.dtype.name == "bfloat16":
            a = a.astype(np.float32)
        cooked[k] = np.ascontiguousarray(a)
    save_file(cooked, path)


def export_medusa(medusa: dict, base_cfg: llama.LlamaConfig, export_dir: str) -> dict:
    """Write medusa heads: medusa_heads.safetensors + config."""
    os.makedirs(export_dir, exist_ok=True)
    tensors = {}
    for h, head in enumerate(medusa["heads"]):
        for b, blk in enumerate(head["blocks"]):
            tensors[f"medusa_heads.{h}.blocks.{b}.weight"] = np.asarray(blk)
        tensors[f"medusa_heads.{h}.lm_head.weight"] = np.asarray(head["lm"])
    _save(tensors, os.path.join(export_dir, "medusa_heads.safetensors"))
    cfg = {
        "speculative_algo": "MEDUSA",
        "num_medusa_heads": len(medusa["heads"]),
        "num_medusa_layers": len(medusa["heads"][0]["blocks"]),
        "base_model": hf_loader.config_to_hf(base_cfg),
    }
    with open(os.path.join(export_dir, "medusa_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return cfg


def export_eagle(eagle: dict, base_cfg: llama.LlamaConfig, export_dir: str) -> dict:
    """Write the EAGLE draft (fusion proj + one-layer decoder)."""
    os.makedirs(export_dir, exist_ok=True)
    tensors = {"fc.weight": np.asarray(eagle["fc"]), "norm.weight": np.asarray(eagle["norm"])}
    for name, arr in eagle["layers"].items():
        tensors[f"layers.{name}"] = np.asarray(arr)
    _save(tensors, os.path.join(export_dir, "eagle_draft.safetensors"))
    cfg = {
        "speculative_algo": "EAGLE",
        "num_draft_layers": int(next(iter(eagle["layers"].values())).shape[0]),
        "base_model": hf_loader.config_to_hf(base_cfg),
    }
    with open(os.path.join(export_dir, "eagle_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return cfg


def load_medusa(export_dir: str) -> dict:
    from safetensors.numpy import load_file

    import jax.numpy as jnp

    with open(os.path.join(export_dir, "medusa_config.json")) as f:
        cfg = json.load(f)
    raw = load_file(os.path.join(export_dir, "medusa_heads.safetensors"))
    heads = []
    for h in range(cfg["num_medusa_heads"]):
        blocks = [
            jnp.asarray(raw[f"medusa_heads.{h}.blocks.{b}.weight"])
            for b in range(cfg["num_medusa_layers"])
        ]
        heads.append({"blocks": blocks, "lm": jnp.asarray(raw[f"medusa_heads.{h}.lm_head.weight"])})
    return {"heads": heads}
