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


def _is_oom(e: Exception) -> bool:
    msg = f"{type(e).__name__}: {e}"
    return any(s in msg for s in (
        "RESOURCE_EXHAUSTED", "Resource exhausted", "out of memory",
        "OutOfMemory", "failed to allocate", "Allocation failure"))


def find_max_batch_size(try_fn, start: int = 1, ceiling: int = 1024) -> int:
    """Largest batch size in [1, ceiling] at which `try_fn(b)` runs without
    exhausting device memory (reference `dataset_utils.py:996`
    get_max_batch_size).

    `try_fn(b)` must BUILD AND EXECUTE the real workload at batch b (jit a
    forward on dummy tokens and block on the value) — compile-only probing
    underestimates activation/workspace memory. Doubles from `start` until
    the first failure, then binary-searches the boundary. OOM is detected
    by exception, not memory_stats: the axon relay reports all-zero stats
    (observed r03/r04 bench logs), so probing by execution is the only
    reliable signal on TPU relays. Non-OOM exceptions propagate.

    Probes at the largest batch run first in doubling order, so transient
    fragmentation from a failed probe can only make the answer
    conservative, never too large.
    """
    start = max(1, start)

    def ok(b: int) -> bool:
        try:
            try_fn(b)
            return True
        except Exception as e:  # noqa: BLE001 — filtered by _is_oom
            if _is_oom(e):
                return False
            raise

    if not ok(start):
        if start == 1 or not ok(1):
            raise MemoryError("workload does not fit at batch size 1")
        lo, hi = 1, start  # caller's start was too optimistic
    else:
        b = start
        while b < ceiling:
            nb = min(2 * b, ceiling)
            if ok(nb):
                b = nb
            else:
                break
        if b == ceiling:
            return ceiling
        lo, hi = b, 2 * b
    # invariant: ok(lo), not ok(hi)
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if ok(mid):
            lo = mid
        else:
            hi = mid
    return lo


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
