"""Layer-by-layer calibration with disk checkpoints (big-model path).

Re-creates `layerwise_calibrate` (`model_calib.py:2051`) + the resume
machinery (`utils/layerwise_calib.py` `_CheckpointState`): activations
propagate through the model one decoder layer at a time, so only a single
layer's weights + one activation tensor are live on device — how a model too
big for one chip's HBM gets calibrated. After each layer, the collected
quantizer state and the propagated activations are checkpointed; a restart
resumes from the last completed layer.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from . import quantizer as Q


def layerwise_calibrate(
    model_cfg: llama.LlamaConfig,
    params: llama.Params,
    layout: llama.QuantLayout,
    batches: list[jax.Array],
    checkpoint_dir: Optional[str] = None,
) -> llama.QuantState:
    """Max-calibrate every site, one layer at a time. Returns stacked qstate.

    `params["layers"]` leaves may be lazily-loaded per layer by passing a
    callable `layer_loader(i) -> layer_params` instead of stacked arrays via
    `params["layer_loader"]` (for models that don't fit in memory at once).
    """
    L = model_cfg.num_hidden_layers
    tokens_list = [jnp.asarray(b) for b in batches]
    B, T = tokens_list[0].shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )[None, None, :, :].astype(jnp.float32)

    start_layer = 0
    acts = None
    layer_states: list = []
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        meta_p = os.path.join(checkpoint_dir, "meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            start_layer = meta["next_layer"]
            with open(os.path.join(checkpoint_dir, "state.pkl"), "rb") as f:
                saved = pickle.load(f)
            layer_states = [
                jax.tree.map(jnp.asarray, s) for s in saved["layer_states"]
            ]
            acts = [jnp.asarray(a) for a in saved["acts"]]

    if acts is None:
        embed = jax.jit(lambda t: params["embed_tokens"][t].astype(model_cfg.dtype))
        acts = [embed(t) for t in tokens_list]

    loader = params.get("layer_loader")

    def get_layer(i):
        if loader is not None:
            return loader(i)
        return llama.slice_layer(params["layers"], i)

    @jax.jit
    def layer_step(lp, x, lstate):
        x_out, new_state, _, _ = llama._decoder_layer(
            model_cfg, layout, True, x, lp, lstate, positions, mask, None
        )
        return x_out, new_state

    for i in range(start_layer, L):
        lp = get_layer(i)
        lstate = _init_layer_state(model_cfg, layout)
        new_acts = []
        for x in acts:
            x_out, lstate = layer_step(lp, x, lstate)
            new_acts.append(x_out)
        acts = new_acts
        layer_states.append(lstate)
        if checkpoint_dir:
            with open(os.path.join(checkpoint_dir, "state.pkl"), "wb") as f:
                pickle.dump(
                    {
                        "layer_states": [jax.tree.map(np.asarray, s) for s in layer_states],
                        "acts": [np.asarray(a) for a in acts],
                    },
                    f,
                )
            with open(os.path.join(checkpoint_dir, "meta.json"), "w") as f:
                json.dump({"next_layer": i + 1, "total": L}, f)

    # stack per-layer states into the model-level [L, ...] layout
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_states)
    qstate = dict(stacked)

    # lm_head (global site)
    lw = layout.get("lm_head.weight")
    if lw.enable:
        head_w = params.get("lm_head", params["embed_tokens"])
        qstate["lm_head.weight"] = Q.collect(head_w, lw, Q.init_state(lw, head_w.shape))
    return qstate


def _init_layer_state(cfg, layout):
    shapes = llama._layer_shapes(cfg)
    state = {}
    for name in llama.PROJ_NAMES:
        wcfg = layout.get(f"{name}.weight")
        icfg = layout.get(f"{name}.input")
        sub = {}
        if wcfg.enable:
            sub["weight"] = Q.init_state(wcfg, shapes[name])
        if icfg.enable:
            sub["input"] = Q.init_state(icfg, (1, 1, shapes[name][1]))
        if sub:
            state[name] = sub
    for name in llama.BMM_NAMES:
        bcfg = layout.get(name)
        if bcfg.enable:
            state[name] = Q.init_state(bcfg, (1, 1, cfg.num_key_value_heads, cfg.hd))
    return state
