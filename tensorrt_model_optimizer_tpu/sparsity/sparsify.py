"""Model-level sparsification API (`mts.sparsify` / `mts.export`).

Reference: `sparsity/weight_sparsity/sparsification.py:32,100` — convert each
linear to a SparseModule with a mask, magnitude or SparseGPT method, export
folds masks into weights. Functional version: returns (params-with-masked-
weights, masks pytree); masks re-apply after QAT updates via `reapply`.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..quant.ptq import CAPTURE_GROUPS
from . import magnitude, sparsegpt


def sparsify(
    model_cfg: llama.LlamaConfig,
    params: llama.Params,
    method: str = "magnitude",  # "magnitude" | "sparsegpt"
    pattern: tuple[int, int] = (2, 4),
    calib_batches: Optional[Iterable[jax.Array]] = None,
    capture_tokens: int = 128,
) -> tuple[llama.Params, dict]:
    """N:M-sparsify every projection. Returns (new_params, masks)."""
    n, m = pattern
    new_layers = dict(params["layers"])
    masks = {}

    if method == "magnitude":
        @jax.jit
        def run(w):
            mask = magnitude.nm_mask(w, n, m)
            return magnitude.apply_mask(w, mask), mask

        for name in llama.PROJ_NAMES:
            new_layers[name], masks[name] = run(params["layers"][name])

    elif method == "sparsegpt":
        if calib_batches is None:
            raise ValueError("sparsegpt requires calib_batches")
        batches = list(calib_batches)
        layout = llama.QuantLayout(sites=())

        @jax.jit
        def cap(t):
            _, _, _, caps = llama.forward(
                model_cfg, params, t, layout=layout,
                calib=True, capture_tokens=capture_tokens,
            )
            return caps

        caps = cap(batches[0])
        for extra in batches[1:]:
            more = cap(extra)
            caps = {k: jnp.concatenate([caps[k], more[k]], axis=1) for k in caps}
        for cap_key, members in CAPTURE_GROUPS.items():
            X = caps[cap_key]  # [L, n_tok, K]
            H = jax.jit(jax.vmap(sparsegpt.hessian_from_acts))(X)
            for name in members:
                w = params["layers"][name]
                prune = jax.jit(
                    jax.vmap(lambda wl, hl: sparsegpt.sparsegpt_prune(wl, hl, n, m))
                )
                new_layers[name], masks[name] = prune(w, H)
    else:
        raise ValueError(f"unknown sparsity method {method!r}")

    out = dict(params)
    out["layers"] = new_layers
    return out, masks


def reapply(params: llama.Params, masks: dict) -> llama.Params:
    """Re-project weights onto their masks (after a QAT/finetune step)."""
    new_layers = dict(params["layers"])
    for name, mask in masks.items():
        new_layers[name] = magnitude.apply_mask(new_layers[name], mask)
    out = dict(params)
    out["layers"] = new_layers
    return out


def export(params: llama.Params, masks: dict) -> llama.Params:
    """Fold masks permanently (mts.export equivalent)."""
    return reapply(params, masks)
