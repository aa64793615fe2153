"""Replayable optimization state + save/restore (mto.save / mto.restore).

Re-creates `ModeloptStateManager` (`modelopt/torch/opt/conversion.py:64`):
the model carries an ordered record of applied (mode, config, metadata); on
restore, modes replay in order to rebuild the quantized structure before
weights load. Storage is a directory:

    modelopt_state.json      — ordered mode list + configs + model config
    quant_state.safetensors  — flattened quantizer-state arrays
    params.safetensors       — (optional) model weights
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..quant import config as qconfig
from ..quant import ptq
from ..quant import quantizer as Q
from ..utils import tree as tree_util
from .mode import ModeDescriptor, ModeRegistry

opt_registry = ModeRegistry("opt")
quant_registry = ModeRegistry("quantization")


@dataclasses.dataclass
class OptState:
    """Ordered (mode, config-dict, metadata-dict) records."""

    modes: list[tuple[str, dict, dict]] = dataclasses.field(default_factory=list)

    def add(self, name: str, config: dict, metadata: Optional[dict] = None):
        self.modes.append((name, config, metadata or {}))

    def to_json(self) -> dict:
        return {"modes": [[n, c, m] for n, c, m in self.modes], "version": 1}

    @staticmethod
    def from_json(d: dict) -> "OptState":
        return OptState(modes=[(n, c, m) for n, c, m in d["modes"]])


def modelopt_state(model: ptq.QuantizedModel) -> OptState:
    """The replayable state of a quantized model (`mto.modelopt_state`)."""
    st = OptState()
    st.add(
        "quantize",
        qconfig.config_to_dict(model.quant_cfg),
        {"model_config": _model_cfg_to_dict(model.model_cfg)},
    )
    return st


def _model_cfg_to_dict(cfg: llama.LlamaConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    return d


def _model_cfg_from_dict(d: dict) -> llama.LlamaConfig:
    d = dict(d)
    d["dtype"] = jnp.dtype(d["dtype"])
    return llama.LlamaConfig(**d)


def _save_safetensors(path: str, named: dict[str, Any]):
    from safetensors.numpy import save_file

    cooked = {}
    for k, v in named.items():
        # copy=True: np.asarray results of relay-backend arrays have been
        # observed to change after later transfers (staging-buffer
        # recycling) — hold owned buffers until the write completes
        cooked[k] = np.array(v, copy=True)
    save_file(cooked, path)


def _qstate_to_named(qstate: llama.QuantState) -> dict[str, np.ndarray]:
    named = {}
    for key, arr in tree_util.flatten_with_names(qstate).items():
        a = np.asarray(arr)
        if a.dtype == jnp.bfloat16:
            a = a.astype(np.float32)
        named[key] = a
    return named


def save(model: ptq.QuantizedModel, path: str, save_params: bool = True) -> None:
    """Save weights + replayable modelopt state (`mto.save`)."""
    os.makedirs(path, exist_ok=True)
    state = modelopt_state(model)
    with open(os.path.join(path, "modelopt_state.json"), "w") as f:
        json.dump(state.to_json(), f, indent=1)
    _save_safetensors(
        os.path.join(path, "quant_state.safetensors"), _qstate_to_named(model.qstate)
    )
    if save_params:
        named = {}
        for k, v in tree_util.flatten_with_names(model.params).items():
            a = np.asarray(v)
            if a.dtype == jnp.bfloat16:
                a = a.view(np.uint16)  # safetensors-numpy lacks bf16; raw bits
                named[k + "::bf16"] = a
            else:
                named[k] = a
        _save_safetensors(os.path.join(path, "params.safetensors"), named)
    if model.adapters:
        # SVDQuant low-rank branch (part of the replayable model state)
        ad_named = {
            f"{name}/{part}": np.asarray(arr, dtype=np.float32)
            for name, sub in model.adapters.items()
            for part, arr in sub.items()
        }
        _save_safetensors(os.path.join(path, "adapters.safetensors"), ad_named)


def restore(path: str, params: Optional[llama.Params] = None) -> ptq.QuantizedModel:
    """Rebuild a quantized model by replaying recorded modes (`mto.restore`).

    If `params` is None, weights load from params.safetensors.
    """
    from safetensors.numpy import load_file

    with open(os.path.join(path, "modelopt_state.json")) as f:
        state = OptState.from_json(json.load(f))
    (name, cfg_dict, meta) = state.modes[0]
    assert name == "quantize", f"first mode {name!r} unsupported"
    model_cfg = _model_cfg_from_dict(meta["model_config"])
    quant_cfg = qconfig.config_from_dict(cfg_dict)

    if params is None:
        raw = load_file(os.path.join(path, "params.safetensors"))
        named = {}
        for k, v in raw.items():
            if k.endswith("::bf16"):
                named[k[: -len("::bf16")]] = jnp.asarray(v.view(np.uint16)).view(jnp.bfloat16)
            else:
                named[k] = jnp.asarray(v)
        template = llama.init_params(model_cfg, jax.random.PRNGKey(0))
        params = tree_util.unflatten_like(template, named)

    # Replay: rebuild layout + state skeleton, then load calibrated arrays.
    layout = llama.build_layout(model_cfg, quant_cfg)
    qstate = llama.init_quant_state(model_cfg, layout)
    # Sequential algorithms add pre_quant_scale leaves not present in the
    # skeleton; rebuild those slots before unflattening.
    saved = load_file(os.path.join(path, "quant_state.safetensors"))
    qstate = _ensure_slots(qstate, saved)
    qstate = tree_util.unflatten_like(qstate, saved)
    adapters = None
    ad_path = os.path.join(path, "adapters.safetensors")
    if os.path.exists(ad_path):
        flat = load_file(ad_path)
        adapters = {}
        for k, v in flat.items():
            name, part = k.rsplit("/", 1)
            adapters.setdefault(name, {})[part] = jnp.asarray(v)
    return ptq.QuantizedModel(model_cfg, params, layout, qstate, quant_cfg,
                              adapters)


def _ensure_slots(qstate, saved: dict) -> llama.QuantState:
    """Add missing pre_quant_scale/amax slots present in the checkpoint."""
    out = {}
    for site, sub in qstate.items():
        if isinstance(sub, dict):
            new_sub = {}
            for part, st in sub.items():
                pqs_key = f"{site}/{part}/pre_quant_scale"
                if pqs_key in saved and st.pre_quant_scale is None:
                    st = st.replace(pre_quant_scale=jnp.zeros(saved[pqs_key].shape, jnp.float32))
                new_sub[part] = st
            # input slots created only by sequential algorithms
            pqs_key = f"{site}/input/pre_quant_scale"
            if "input" not in new_sub and pqs_key in saved:
                new_sub["input"] = Q.QuantizerState(
                    pre_quant_scale=jnp.zeros(saved[pqs_key].shape, jnp.float32)
                )
            out[site] = new_sub
        else:
            out[site] = sub
    return out


def save_sharded(model: ptq.QuantizedModel, path: str) -> None:
    """Multi-host sharded save via orbax (the Megatron dist-ckpt analog,
    `opt/plugins/mcore_dist_checkpointing.py:112`): each host writes only its
    shards; the replayable modelopt state rides alongside."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "modelopt_state.json"), "w") as f:
        json.dump(modelopt_state(model).to_json(), f, indent=1)
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": model.params, "qstate": model.qstate}
    if model.adapters:
        tree["adapters"] = model.adapters
    ckptr.save(os.path.join(path, "arrays"), tree)
    ckptr.wait_until_finished()


def restore_sharded(
    path: str,
    shardings: Optional[Any] = None,
) -> ptq.QuantizedModel:
    """Restore a sharded checkpoint; `shardings` optionally maps the params
    pytree to jax.sharding.Sharding objects for direct sharded placement."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "modelopt_state.json")) as f:
        state = OptState.from_json(json.load(f))
    (name, cfg_dict, meta) = state.modes[0]
    model_cfg = _model_cfg_from_dict(meta["model_config"])
    quant_cfg = qconfig.config_from_dict(cfg_dict)
    ckptr = ocp.StandardCheckpointer()
    if shardings is not None:
        restored = ckptr.restore(os.path.join(path, "arrays"), shardings)
    else:
        restored = ckptr.restore(os.path.join(path, "arrays"))
    layout = llama.build_layout(model_cfg, quant_cfg)
    qstate = _rewrap_qstate(restored["qstate"])
    adapters = restored.get("adapters")
    return ptq.QuantizedModel(
        model_cfg, restored["params"], layout, qstate, quant_cfg, adapters
    )


def _rewrap_qstate(raw) -> llama.QuantState:
    """Orbax restores dataclasses as plain dicts; rebuild QuantizerStates."""

    def wrap(node):
        if isinstance(node, dict) and set(node) <= {"amax", "pre_quant_scale", "bias", "aux"}:
            return Q.QuantizerState(**node)
        if isinstance(node, dict):
            return {k: wrap(v) for k, v in node.items()}
        return node

    return {k: wrap(v) for k, v in raw.items()}


# Register the quantize mode
quant_registry.register(
    ModeDescriptor(
        name="quantize",
        convert=lambda handle, cfg, **kw: (ptq.quantize(*handle, cfg, **kw), {}),
        restore=lambda handle, cfg, meta: restore(meta["path"], params=handle),
        config_to_dict=qconfig.config_to_dict,
        config_from_dict=qconfig.config_from_dict,
    )
)
