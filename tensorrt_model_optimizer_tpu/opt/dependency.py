"""Structural dependency map — the trace/SymMap analog.

The reference fx-traces models to discover which dimensions must change
together under pruning (`modelopt/torch/trace/{tracer,symbols}.py`). In this
framework models are explicit functional architectures, so the dependency
graph is *declared* per architecture instead of recovered by tracing — same
information, no fragile symbolic execution.

Each named dimension lists the (param, axis) sites tied to it; pruning any
dimension must slice every listed site coherently (this is exactly what
`prune/minitron.py` implements for llama — these tables let generic search
code validate/enumerate prunable dims).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DimGroup:
    """A prunable dimension and every (param, axis) slot tied to it."""

    name: str
    size_attr: str  # config field holding the dimension size
    sites: tuple[tuple[str, int], ...]  # (param path under layers/, axis)
    divisor_attr: str | None = None  # granularity constraint (e.g. head_dim)


LLAMA_DIM_GROUPS: tuple[DimGroup, ...] = (
    DimGroup(
        name="hidden",
        size_attr="hidden_size",
        sites=(
            ("embed_tokens", 1),
            ("lm_head", 1),
            ("norm", 0),
            ("layers/input_layernorm", 1),
            ("layers/post_attention_layernorm", 1),
            ("layers/self_attn.q_proj", 2),
            ("layers/self_attn.k_proj", 2),
            ("layers/self_attn.v_proj", 2),
            ("layers/self_attn.o_proj", 1),
            ("layers/mlp.gate_proj", 2),
            ("layers/mlp.up_proj", 2),
            ("layers/mlp.down_proj", 1),
        ),
    ),
    DimGroup(
        name="intermediate",
        size_attr="intermediate_size",
        sites=(
            ("layers/mlp.gate_proj", 1),
            ("layers/mlp.up_proj", 1),
            ("layers/mlp.down_proj", 2),
        ),
    ),
    DimGroup(
        name="kv_heads",
        size_attr="num_key_value_heads",
        sites=(
            ("layers/self_attn.k_proj", 1),
            ("layers/self_attn.v_proj", 1),
            # q/o follow through the GQA ratio (heads per kv group)
            ("layers/self_attn.q_proj", 1),
            ("layers/self_attn.o_proj", 2),
        ),
        divisor_attr="head_dim",
    ),
    DimGroup(
        name="depth",
        size_attr="num_hidden_layers",
        sites=tuple(
            (f"layers/{n}", 0)
            for n in (
                "input_layernorm", "post_attention_layernorm",
                "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
                "mlp.down_proj",
            )
        ),
    ),
)


def validate_groups(params: dict, cfg, groups=LLAMA_DIM_GROUPS) -> list[str]:
    """Check that every declared site exists and its axis size matches the
    config dimension. Returns a list of violations (empty = consistent)."""
    problems = []
    for g in groups:
        expect = getattr(cfg, g.size_attr)
        if g.size_attr == "num_key_value_heads":
            continue  # sizes are heads*head_dim; handled by minitron
        for path, axis in g.sites:
            node = params
            for part in path.split("/"):
                if not isinstance(node, dict) or part not in node:
                    node = None
                    break
                node = node[part]
            if node is None:
                continue  # optional site (e.g. lm_head when tied)
            if node.shape[axis] != expect:
                problems.append(
                    f"{g.name}: {path} axis {axis} is {node.shape[axis]}, expected {expect}"
                )
    return problems
