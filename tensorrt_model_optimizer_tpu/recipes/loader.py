"""Typed YAML recipes with import composition and dotlist overrides.

Re-creates the reference's config system (SURVEY §5 "Config / flag system"):
 - schema-tagged YAML (`# modelopt-schema:` header, `opt/config_loader.py:619`)
 - `imports:` composition with local-file-overrides-builtin resolution
   (`_resolve_imports:409`; builtin root = this package's `builtin/` dir)
 - dotlist overrides `key.sub=value` (`recipe/loader.py:122`)
 - typed validation into recipe dataclasses (`recipe/config.py:116`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import yaml

BUILTIN_ROOT = os.path.join(os.path.dirname(__file__), "builtin")
SCHEMA_TAG = "# modelopt-schema:"


@dataclasses.dataclass
class CalibRecipe:
    num_batches: int = 8
    batch_size: int = 2
    seq_len: int = 512
    data: Optional[str] = None
    tokenizer: Optional[str] = None


@dataclasses.dataclass
class QuantRecipe:
    preset: str = "FP8_DEFAULT_CFG"
    overrides: dict = dataclasses.field(default_factory=dict)
    auto_quantize_bits: Optional[float] = None


@dataclasses.dataclass
class PTQRecipe:
    model: str = "tiny"
    quant: QuantRecipe = dataclasses.field(default_factory=QuantRecipe)
    calib: CalibRecipe = dataclasses.field(default_factory=CalibRecipe)
    export_path: Optional[str] = None
    save_state: Optional[str] = None

    def resolve_quant_config(self):
        from ..quant import get_preset

        cfg = get_preset(self.quant.preset)
        if self.quant.overrides:
            cfg = cfg.with_rules(self.quant.overrides)
        return cfg


SCHEMAS = {"ptq-recipe/v1": PTQRecipe}


def _find(path: str) -> str:
    """Filesystem path wins; fall back to the builtin recipe root."""
    if os.path.exists(path):
        return path
    builtin = os.path.join(BUILTIN_ROOT, path)
    if os.path.exists(builtin):
        return builtin
    raise FileNotFoundError(f"recipe {path!r} not found (also tried {builtin})")


def _read_yaml(path: str) -> tuple[dict, Optional[str]]:
    with open(path) as f:
        text = f.read()
    schema = None
    for line in text.splitlines():
        if line.strip().startswith(SCHEMA_TAG):
            schema = line.split(SCHEMA_TAG, 1)[1].strip()
            break
    data = yaml.safe_load(text) or {}
    return data, schema


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _resolve_imports(data: dict, base_dir: str) -> dict:
    imports = data.pop("imports", [])
    merged: dict = {}
    for imp in imports:
        p = imp if os.path.isabs(imp) else os.path.join(base_dir, imp)
        try:
            p = _find(p)
        except FileNotFoundError:
            p = _find(imp)
        sub, _ = _read_yaml(p)
        sub = _resolve_imports(sub, os.path.dirname(p))
        merged = _deep_merge(merged, sub)
    return _deep_merge(merged, data)


def _parse_value(v: str) -> Any:
    try:
        return yaml.safe_load(v)
    except yaml.YAMLError:
        return v


def apply_dotlist(data: dict, overrides: list[str]) -> dict:
    out = dict(data)
    for item in overrides:
        key, _, val = item.partition("=")
        parts = key.strip().split(".")
        node = out
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
            node[p] = dict(nxt)
            node = node[p]
        node[parts[-1]] = _parse_value(val)
    return out


def _to_dataclass(cls, data: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            v = _to_dataclass(f.type, v)
        elif f.name == "quant" and isinstance(v, dict):
            v = _to_dataclass(QuantRecipe, v)
        elif f.name == "calib" and isinstance(v, dict):
            v = _to_dataclass(CalibRecipe, v)
        kwargs[f.name] = v
    return cls(**kwargs)


def load_recipe(path: str, overrides: Optional[list[str]] = None):
    """Load a schema-tagged YAML recipe with imports + dotlist overrides."""
    p = _find(path)
    data, schema = _read_yaml(p)
    data = _resolve_imports(data, os.path.dirname(p))
    if overrides:
        data = apply_dotlist(data, overrides)
    if schema is None:
        raise ValueError(f"{path}: missing '{SCHEMA_TAG} <name>' header")
    if schema not in SCHEMAS:
        raise ValueError(f"{path}: unknown schema {schema!r} (known: {list(SCHEMAS)})")
    return _to_dataclass(SCHEMAS[schema], data)
