"""mtq-style API façade — the reference's `modelopt.torch.quantization`
entry-point names mapped onto this framework (SURVEY §2.2 public interface:
`mtq.quantize/calibrate/auto_quantize/compress/fold_weight/
print_quant_summary`, `model_quant.py:61-725`)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models import llama
from . import quantizer as Q
from .auto import auto_quantize  # noqa: F401
from .compress import compress  # noqa: F401
from .config import PRESETS, choices, get_preset, make_config  # noqa: F401
from .ptq import QuantizedModel, calibrate, print_quant_summary, quantize  # noqa: F401


def fold_weight(model: QuantizedModel) -> QuantizedModel:
    """Fold fake-quantized weights into the params and disable the weight
    quantizers (`mtq.fold_weight`, `model_quant.py:706` / QuantModule
    `fold_weight`): after folding, forward uses plain matmuls on already-
    quantized values."""
    new_layers = dict(model.params["layers"])
    new_sites = []
    for site, cfg in model.layout.sites:
        if site.endswith(".weight") and cfg.enable and not site.startswith("lm_head"):
            name = site[: -len(".weight")]
            if name in new_layers and not isinstance(new_layers[name], dict):
                st = model.qstate.get(name, {}).get("weight")
                w = new_layers[name]
                folded = jax.vmap(lambda wl, sl: Q.quantize(wl, cfg, sl))(w, st)
                new_layers[name] = folded.astype(w.dtype)
            new_sites.append((site, Q.DISABLED))
        else:
            new_sites.append((site, cfg))
    params = dict(model.params)
    params["layers"] = new_layers
    return dataclasses.replace(
        model,
        params=params,
        layout=llama.QuantLayout(sites=tuple(new_sites)),
    )


def disable_quantizer(model: QuantizedModel, pattern: str) -> QuantizedModel:
    """Disable quantizers matching a wildcard (`mtq.disable_quantizer`)."""
    import fnmatch

    new_sites = tuple(
        (site, Q.DISABLED if fnmatch.fnmatch(site, pattern) else cfg)
        for site, cfg in model.layout.sites
    )
    return dataclasses.replace(model, layout=llama.QuantLayout(sites=new_sites))


def compute_quantization_mse(model: QuantizedModel) -> dict[str, float]:
    """Per-weight-site quantization MSE (`mtq` debug probe,
    `model_quant.py:737`)."""
    out = {}
    for name in llama.PROJ_NAMES:
        cfg = model.layout.get(f"{name}.weight")
        if not cfg.enable:
            continue
        st = model.qstate.get(name, {}).get("weight")
        w = model.params["layers"][name]
        if isinstance(w, dict):
            continue
        q = jax.vmap(lambda wl, sl: Q.quantize(wl, cfg, sl))(w, st)
        out[name] = float(jnp.mean((q.astype(jnp.float32) - w.astype(jnp.float32)) ** 2))
    return out
