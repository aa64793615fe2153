#!/usr/bin/env python
"""Measure fixed per-pallas_call overhead inside a jitted scan.

Hypothesis test (2026-08-18): engine decode = 224 pallas calls/step at
~160 ms while pure-XLA bf16 runs 18 ms/step (L16) — is there a large fixed
cost per Mosaic custom call on this backend?  Scans a TRIVIAL kernel
(one [8,128] add) N times vs the same math in plain XLA, and a mid-size
[8,2048]x[2048,256] dot kernel vs its XLA twin.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

L = int(os.environ.get("PROBE_LAYERS", "64"))
REPS = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = jax.devices()[0].platform not in ("tpu", "axon")

    def tiny_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = x_ref[:] + w_ref[:]

    def tiny_pallas(x, w):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interp,
        )(x, w)

    def dot_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def dot_pallas(x, w):
        return pl.pallas_call(
            dot_kernel,
            out_shape=jax.ShapeDtypeStruct((x.shape[0], w.shape[0]), x.dtype),
            interpret=interp,
        )(x, w)

    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (8, 128), jnp.bfloat16)
    ws = jax.random.normal(key, (L, 8, 128), jnp.bfloat16)
    xd = jax.random.normal(key, (8, 2048), jnp.bfloat16)
    wd = jax.random.normal(key, (L, 256, 2048), jnp.bfloat16) * 0.02

    cases = {
        "tiny_pallas": (xs, ws, lambda x, w: tiny_pallas(x, w)),
        "tiny_xla": (xs, ws, lambda x, w: x + w),
        "dot_pallas": (xd, wd, lambda x, w: dot_pallas(x, w)[:, :2048]),
        "dot_xla": (xd, wd, lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)[:, :2048]),
    }

    fns = {}
    for name, (x0, w0, one) in cases.items():
        def step(x, ws, one=one, x0=x0):
            def body(x, wl):
                y = one(x, wl)
                upd = y.sum(axis=1, keepdims=True) * 1e-6  # depends on ALL of y (no DCE)
                return (x + upd.astype(x.dtype)), ()
            x, _ = jax.lax.scan(body, x, ws)
            return x
        f = jax.jit(step)
        r = f(x0, w0)
        np.asarray(r)
        fns[name] = (f, x0, w0)

    for rnd in range(3):
        line = []
        for name, (f, x0, w0) in fns.items():
            x = x0
            t0 = time.time()
            for _ in range(REPS):
                x = f(x, w0)
            np.asarray(x)
            us = (time.time() - t0) / (REPS * L) * 1e6
            line.append(f"{name}={us:.1f}us")
        print(f"round {rnd + 1}: " + "  ".join(line), flush=True)


if __name__ == "__main__":
    main()
