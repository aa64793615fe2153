"""Logging helpers (`utils/logging.py` equivalents).

`print_rank_0` / `atomic_print` for multi-host runs: on a JAX mesh the
"rank" is `jax.process_index()`; atomicity comes from single-writes to an
unbuffered stream rather than torch.distributed barriers.
"""

from __future__ import annotations

import sys
import threading

_lock = threading.Lock()


def print_rank_0(*args, **kw) -> None:
    """Print only on the first host process (multi-host safe)."""
    import jax

    if jax.process_index() == 0:
        print(*args, **kw)


def atomic_print(*args, flush: bool = True, **kw) -> None:
    """Serialize prints across threads (one write per call)."""
    with _lock:
        msg = " ".join(str(a) for a in args)
        sys.stdout.write(msg + kw.get("end", "\n"))
        if flush:
            sys.stdout.flush()
