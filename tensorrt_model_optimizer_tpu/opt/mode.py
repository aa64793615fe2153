"""Mode registry — the unit of optimization.

Re-creates the reference's `ModeDescriptor`/`_ModeRegistryCls`
(`modelopt/torch/opt/mode.py:56,277`): a *mode* is a named, replayable model
transformation with a serializable config. Functional twist: `convert` maps a
model handle to a new handle + metadata (no in-place mutation), and `restore`
replays the transformation from (config, metadata) — which is how checkpoints
rebuild quantizer state before weights load (`opt/conversion.py:577`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

ConvertFn = Callable[..., tuple[Any, dict]]  # (handle, config, **kw) -> (handle, metadata)
RestoreFn = Callable[..., Any]  # (handle, config, metadata) -> handle


@dataclasses.dataclass(frozen=True)
class ModeDescriptor:
    name: str
    convert: ConvertFn
    restore: RestoreFn
    config_to_dict: Callable[[Any], dict]
    config_from_dict: Callable[[dict], Any]
    # Which modes may legally follow (None = any); mirrors `next_modes`.
    next_modes: Optional[tuple[str, ...]] = None
    # Mode that exports/strips this one (e.g. distill export drops teacher).
    export_mode: Optional[str] = None


class ModeRegistry:
    """Per-technique registry + global lookup (`_ModeRegistryCls`)."""

    _all: dict[str, "ModeRegistry"] = {}

    def __init__(self, technique: str):
        self.technique = technique
        self._modes: dict[str, ModeDescriptor] = {}
        ModeRegistry._all[technique] = self

    def register(self, desc: ModeDescriptor) -> ModeDescriptor:
        if desc.name in self._modes:
            raise ValueError(f"mode {desc.name!r} already registered in {self.technique}")
        self._modes[desc.name] = desc
        return desc

    def __contains__(self, name: str) -> bool:
        return name in self._modes

    def __getitem__(self, name: str) -> ModeDescriptor:
        return self._modes[name]

    @staticmethod
    def get_global(name: str) -> ModeDescriptor:
        for reg in ModeRegistry._all.values():
            if name in reg:
                return reg[name]
        raise KeyError(f"mode {name!r} not registered in any technique registry")

    @staticmethod
    def all_modes() -> dict[str, ModeDescriptor]:
        out = {}
        for reg in ModeRegistry._all.values():
            out.update(reg._modes)
        return out
