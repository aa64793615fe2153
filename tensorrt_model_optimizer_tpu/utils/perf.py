"""Perf timers + device memory reporting (`utils/perf.py`, `memory_monitor`)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Timer:
    """Accumulating named timer (`utils/perf.py` Timer analog)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [
            f"{k:32s} {self.totals[k]*1e3:10.2f} ms total  {self.totals[k]/self.counts[k]*1e3:8.2f} ms/call x{self.counts[k]}"
            for k in sorted(self.totals)
        ]
        return "\n".join(lines)


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Live/peak HBM usage where the backend exposes it."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


def tree_bytes(tree) -> int:
    """Total bytes of a pytree's array leaves."""
    return sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(tree) if hasattr(a, "dtype"))