"""Per-op latency profiling (`modelopt/torch/_deploy/profiling.py:28,111`).

`get_latency` = end-to-end decode-step latency; `profile` = per-projection
breakdown: each unique (kind, shape) quantized matmul is timed standalone on
the current backend — where the decode milliseconds go, per layer type.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..quant.compress import CompressedModel
from . import engine as engine_mod


def _time_fn(fn, *args, iters: int = 8) -> float:
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def profile_matmuls(eng: "engine_mod.Engine", batch: int = 8, iters: int = 8) -> dict:
    """Per-projection matmul latency (one layer each) on the engine backend."""
    cm = eng.cm
    cfg = cm.model_cfg
    shapes = llama._layer_shapes(cfg)
    out = {}
    for name in llama.PROJ_NAMES:
        o, k = shapes[name]
        arrays = llama.slice_layer(cm.params["layers"][name], 0)
        if not isinstance(arrays, dict):
            arrays = {"w": arrays}
        kind = cm.kinds.get(name, "bf16")
        x = jnp.ones((batch, k), cfg.dtype)
        ist_all = cm.qstate.get(name, {}).get("input") if isinstance(cm.qstate, dict) else None
        ist = llama.slice_layer(ist_all, 0) if ist_all is not None else None
        fn = jax.jit(
            lambda x, a, st, n=name, kd=kind: engine_mod._qlinear(
                x, n, kd, a, cm, eng.backend, st
            )
        )
        dt = _time_fn(fn, x, arrays, ist, iters=iters)
        out[name] = {
            "kind": kind,
            "shape": [o, k],
            "us": round(dt * 1e6, 1),
            "us_per_model": round(dt * 1e6 * cfg.num_hidden_layers, 1),
        }
    return out


def get_latency(eng: "engine_mod.Engine", batch: int = 8, prefill: int = 128,
                steps: int = 8) -> dict:
    """End-to-end decode-step latency + derived tokens/s."""
    cfg = eng.cm.model_cfg
    cache = eng.init_cache(batch, prefill + steps + 8)
    cache["pos"] = jnp.asarray(prefill, jnp.int32)
    tok = jnp.zeros((batch, 1), jnp.int32)

    # reuse the engine's single-step path
    from functools import partial

    step = jax.jit(partial(engine_mod._model_step, cfg, eng.ecfg, eng.cm, eng.backend))

    def run(tok, cache):
        positions = jnp.broadcast_to(cache["pos"][None, None], (batch, 1)).astype(jnp.int32)
        logits, cache = step(eng.cm.params, eng.cm.qstate, tok, cache, positions)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

    t2, cache = run(tok, cache)
    jax.block_until_ready(t2)
    t0 = time.perf_counter()
    for _ in range(steps):
        t2, cache = run(t2, cache)
    jax.block_until_ready(t2)
    dt = (time.perf_counter() - t0) / steps
    return {
        "step_ms": round(dt * 1e3, 3),
        "tok_s": round(batch / dt, 1),
        "batch": batch,
    }
