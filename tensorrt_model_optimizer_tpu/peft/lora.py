"""LoRA adapters + QLoRA (`modelopt/torch/peft`, `peft/convert.py:45-177`).

Functional design: adapters are a separate pytree {proj_name: {"A": [L, r,
d_in], "B": [L, d_out, r], "scale": [L]}} that rides through the model scan;
`update_model` = init; enable/disable = include or drop the tree; `merge`
folds B@A into the base weights (adapter export). QLoRA = base weights under
a quant layout + bf16 adapters, trained with the quantized forward (STE).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable, Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..quant import qat as qat_mod


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0
    targets: tuple[str, ...] = llama.PROJ_NAMES  # which projections get adapters


def init_adapters(cfg: llama.LlamaConfig, lcfg: LoRAConfig, key: jax.Array) -> dict:
    """A ~ N(0, 1/r), B = 0 (standard LoRA init: adapter starts as identity)."""
    shapes = llama._layer_shapes(cfg)
    L, r = cfg.num_hidden_layers, lcfg.rank
    out = {}
    for i, name in enumerate(lcfg.targets):
        o, inp = shapes[name]
        k = jax.random.fold_in(key, i)
        out[name] = {
            "A": (jax.random.normal(k, (L, r, inp), jnp.float32) / math.sqrt(r)).astype(cfg.dtype),
            "B": jnp.zeros((L, o, r), cfg.dtype),
            "scale": jnp.full((L,), lcfg.alpha / r, jnp.float32),
        }
    return out


def merge(params: llama.Params, adapters: dict) -> llama.Params:
    """Fold adapters into the base weights (disable-by-merge export)."""
    new_layers = dict(params["layers"])
    for name, ad in adapters.items():
        delta = jnp.einsum("lor,lri->loi", ad["B"].astype(jnp.float32), ad["A"].astype(jnp.float32))
        w = new_layers[name]
        new_layers[name] = (w.astype(jnp.float32) + delta * ad["scale"][:, None, None]).astype(w.dtype)
    out = dict(params)
    out["layers"] = new_layers
    return out


def make_lora_train_step(
    cfg: llama.LlamaConfig,
    lr: float = 1e-3,
    layout: Optional[llama.QuantLayout] = None,
):
    """Train adapters only (base + qstate frozen). With `layout`, the base
    forward runs fake-quantized = QLoRA."""

    def loss_fn(adapters, params, qstate, tokens):
        logits, _, _ = llama.forward(
            cfg, params, tokens[:, :-1], layout=layout, qstate=qstate,
            adapters=adapters,
        )
        return qat_mod.cross_entropy(logits, tokens[:, 1:])

    def step(adapters, params, tokens, qstate=None):
        loss, grads = jax.value_and_grad(loss_fn)(adapters, params, qstate, tokens)
        new = jax.tree.map(lambda a, g: a - lr * g.astype(a.dtype), adapters, grads)
        return new, loss

    return step
