"""Device memory observability (`utils/memory_monitor.py` equivalent).

The reference polls GPU memory in a background thread; on TPU the runtime
exposes per-device stats synchronously via `Device.memory_stats()`, so the
monitor is a sampler + peak tracker around that.
"""

from __future__ import annotations

from typing import Optional


def device_memory_stats(device=None) -> dict:
    """Raw memory stats for one device ({} where the backend lacks them)."""
    import jax

    d = device or jax.devices()[0]
    try:
        return dict(d.memory_stats() or {})
    except Exception:
        return {}


def memory_summary() -> str:
    """One line per device: in-use / peak / limit (GiB where known)."""
    import jax

    lines = []
    for d in jax.local_devices():
        st = device_memory_stats(d)
        gib = 1024**3
        used = st.get("bytes_in_use")
        peak = st.get("peak_bytes_in_use")
        lim = st.get("bytes_limit")
        fmt = lambda v: f"{v / gib:.2f}GiB" if v is not None else "?"
        lines.append(
            f"{d.platform}:{d.id} in_use={fmt(used)} peak={fmt(peak)} limit={fmt(lim)}"
        )
    return "\n".join(lines)


class MemoryMonitor:
    """Peak-memory tracker over a code region (the reference's monitor,
    minus the polling thread — TPU allocations are runtime-tracked)."""

    def __init__(self, device=None):
        self.device = device
        self.start: Optional[dict] = None
        self.end: Optional[dict] = None

    def __enter__(self):
        self.start = device_memory_stats(self.device)
        return self

    def __exit__(self, *exc):
        self.end = device_memory_stats(self.device)
        return False

    @property
    def peak_bytes(self) -> Optional[int]:
        return (self.end or {}).get("peak_bytes_in_use")

    @property
    def delta_bytes(self) -> Optional[int]:
        a = (self.start or {}).get("bytes_in_use")
        b = (self.end or {}).get("bytes_in_use")
        return (b - a) if (a is not None and b is not None) else None
