"""Tensor/expert-parallel serving for the DeepSeek engine.

Sharding plan (one mesh axis, default "tp" — the reference splits DeepSeek
checkpoints per TP rank and hands them to TRT-LLM/SGLang,
`examples/deepseek/ptq.py:129` + `export/postprocess.py:852`; here the
packed model is re-laid-out once and every step runs under `shard_map`):

 - MLA attention shards over HEADS: `q_b_proj`/`q_proj` and `kv_b_proj`
   column-parallel (output rows are head-major, so TP-major plane repacking
   keeps each shard's 4-bit planes self-contained), `o_proj` row-parallel
   (+psum). The LATENT projections (`q_a_proj`, `kv_a_proj`) and the latent
   cache itself REPLICATE — the cache is shared by all heads (that is MLA's
   memory win) and is tiny, so replicating it costs ~nothing while keeping
   attention fully local per shard.
 - Routed experts shard over the SAME axis (EP): expert-stacked arrays
   [L, E, ...] slice on E with no repacking (plane pairing is along each
   expert's own output dim). Routing runs replicated on the full router;
   each shard applies its local expert block and the combine rides one psum
   together with the shared-expert down partial.
 - Shared experts + dense-layer MLPs: Megatron column/row like llama
   (`serve/tp.py`).
 - embed / lm_head / norms / router replicate.

Numerics parity: dynamic per-token activation amaxes of row-parallel sites
are pmax-reduced across the axis, so real-quant decode is bit-identical to
the single-device engine (tested in tests/test_deepseek_tp.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
from jax.sharding import PartitionSpec as P

from ..models import deepseek as ds
from . import tp as tp_mod

# column-parallel (output dim sharded)
DS_COL = (
    "self_attn.q_proj",
    "self_attn.q_b_proj",
    "self_attn.kv_b_proj",
    "mlp.gate_proj",
    "mlp.up_proj",
    "shared.gate_proj",
    "shared.up_proj",
)
# row-parallel (input dim sharded, psum after)
DS_ROW = ("self_attn.o_proj", "mlp.down_proj", "shared.down_proj")
# expert-parallel (leading E axis of [L, E, ...] stacks sharded)
DS_EP = ("moe.gate_proj", "moe.up_proj", "moe.down_proj")


def _ep_specs(arrays: dict, axis: str) -> dict:
    """Shard every [L, E, ...] leaf of an expert-stacked site on E."""
    specs = {}
    for k, v in arrays.items():
        if v is None:
            specs[k] = None
        elif getattr(v, "ndim", 0) >= 2:
            specs[k] = P(None, axis, *([None] * (v.ndim - 2)))
        else:
            specs[k] = P()
    return specs


@dataclasses.dataclass
class DeepseekTPSpecs:
    params: Any
    qstate: Any
    axis: str
    n_shards: int


def shard_deepseek(cm, n_shards: int, axis: str = "tp"):
    """Re-layout a DeepseekCompressedModel for n_shards-way TP/EP.

    Returns (new_cm, DeepseekTPSpecs). Packed column sites repack to the
    TP-major plane layout (tp._plane_to_tp_major); EP sites slice on E
    directly. Validates divisibility.
    """
    cfg = cm.model_cfg
    d = n_shards
    assert cfg.num_attention_heads % d == 0, "heads not divisible by tp"
    assert cfg.n_routed_experts % d == 0, "routed experts not divisible by tp"
    assert cfg.moe_intermediate_size * cfg.n_shared_experts % d == 0
    assert cfg.intermediate_size % d == 0

    params = dict(cm.params)
    kinds = dict(cm.kinds)
    param_specs: dict[str, Any] = {
        k: P() for k in params if k not in ("layers_dense", "layers_moe")
    }

    for group in ("layers_dense", "layers_moe"):
        if group not in params:
            continue
        new = dict(params[group])
        gspecs: dict[str, Any] = {}
        for name, arrays in new.items():
            kind = cm.kinds.get(name)
            if name in DS_EP:
                gspecs[name] = _ep_specs(arrays, axis)
            elif name in DS_COL and kind is not None:
                arrays, specs = tp_mod._relayout_site(kind, arrays, True, d, axis)
                new[name] = arrays
                gspecs[name] = specs
            elif name in DS_ROW and kind is not None:
                arrays, specs = tp_mod._relayout_site(kind, arrays, False, d, axis)
                new[name] = arrays
                gspecs[name] = specs
            else:
                # replicated: latent projections, norms, router, e_bias
                gspecs[name] = (
                    {k: P() for k in arrays} if isinstance(arrays, dict) else P()
                )
        params[group] = new
        param_specs[group] = gspecs

    # qstate: replicate everything except pre_quant_scale of row sites
    # (their K dim is sharded) — mirrors serve/tp.py.
    def _qspec(site: str, which: str, st):
        if st is None:
            return None
        pqs_spec = P()
        if which == "input" and site in DS_ROW and getattr(st, "pre_quant_scale", None) is not None:
            nd = st.pre_quant_scale.ndim
            pqs_spec = P(*([None] * (nd - 1) + [axis]))
        return tp_mod._state_spec_like(st, pqs_spec)

    qstate_specs = {}
    for group, sites in cm.qstate.items():
        if not isinstance(sites, dict):
            qstate_specs[group] = _qspec("", "", sites)
            continue
        gq = {}
        for site, sub in sites.items():
            gq[site] = (
                {which: _qspec(site, which, st) for which, st in sub.items()}
                if isinstance(sub, dict)
                else _qspec(site, "", sub)
            )
        qstate_specs[group] = gq

    new_cm = dataclasses.replace(cm, params=params, kinds=kinds)
    return new_cm, DeepseekTPSpecs(param_specs, qstate_specs, axis, d)


def device_put_sharded(cm, mesh, specs: DeepseekTPSpecs):
    from jax.sharding import NamedSharding

    def put(x, spec):
        if x is None or spec is None:
            return x
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = jax.tree.map(
        put, cm.params, tp_mod._concretize(specs.params, cm.params),
        is_leaf=lambda x: x is None,
    )
    return dataclasses.replace(cm, params=params)


def cache_specs(cache: dict) -> dict:
    """The MLA latent cache replicates (shared across heads)."""
    return {k: P() for k in cache}
