"""Pytree <-> flat named-array dict utilities (for safetensors/export)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def flatten_with_names(tree: Any, prefix: str = "") -> dict[str, jax.Array]:
    """Flatten a nested dict/dataclass pytree into {"a/b/c": array}."""
    out: dict[str, jax.Array] = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = "/".join(_path_str(p) for p in path)
        out[prefix + key] = leaf
    return out


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def unflatten_like(template: Any, named: dict[str, Any], prefix: str = "") -> Any:
    """Rebuild a pytree with `template`'s structure from a flat name dict."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = prefix + "/".join(_path_str(p) for p in path)
        if key in named:
            arr = named[key]
            leaves.append(jnp.asarray(arr))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def to_numpy_tree(tree: Any) -> Any:
    return jax.tree.map(lambda a: np.asarray(a), tree)
