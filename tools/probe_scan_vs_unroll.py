#!/usr/bin/env python
"""Does lax.scan over stacked weights materialize the per-layer slice
before a Pallas custom call (an HBM copy XLA fuses away for its own dots)?

Four cases, one process, interleaved:
  xla_scan      x @ ws[l].T inside lax.scan          (dot fuses the slice?)
  xla_unroll    x @ w_l.T, python loop, separate args
  pal_scan      qmm_nvfp4_word inside lax.scan
  pal_unroll    qmm_nvfp4_word, python loop, separate args
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

L = int(os.environ.get("PROBE_LAYERS", "16"))
B, O, K = 8, 14336, 4096
REPS = 4


def main():
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.ops.pallas import qmm

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.fold_in(key, 9), (B, K), jnp.bfloat16)

    wb = jax.jit(
        lambda k: jax.lax.bitcast_convert_type(
            jax.random.randint(k, (L, O, K), 0, 0x3C00, jnp.int32).astype(jnp.uint16),
            jnp.bfloat16,
        )
    )(key)
    p = jax.jit(
        lambda k: jax.random.randint(k, (L, O // 2, K), 0, 256, jnp.int32).astype(
            jnp.uint8
        )
    )(key)
    s = jnp.full((L, O // 2, K // 16), 1.0, jnp.float8_e4m3fn)
    g = jnp.full((L,), 1e-2, jnp.float32)
    pw, sw = jax.vmap(lambda pp, aa, bb: qmm.nvfp4_word_pack(pp, aa, bb))(p, s, s)

    def fb(x, y):
        return x + (y.sum(axis=1, keepdims=True) * 1e-6).astype(x.dtype)

    def xla_scan(x, wb):
        def body(x, w):
            return fb(x, x @ w.T), ()
        return jax.lax.scan(body, x, wb)[0]

    def xla_unroll(x, *ws):
        for w in ws:
            x = fb(x, x @ w.T)
        return x

    def pal_scan(x, pw, sw, g):
        def body(x, wl):
            return fb(x, qmm.qmm_nvfp4_word(x, *wl)), ()
        return jax.lax.scan(body, x, (pw, sw, g))[0]

    def pal_unroll(x, g0, *ws):
        n = len(ws) // 2
        for i in range(n):
            x = fb(x, qmm.qmm_nvfp4_word(x, ws[i], ws[n + i], g0))
        return x

    cases = {
        "xla_scan": (jax.jit(xla_scan), (x0, wb)),
        "xla_unroll": (jax.jit(xla_unroll), (x0, *[wb[i] for i in range(L)])),
        "pal_scan": (jax.jit(pal_scan), (x0, pw, sw, g)),
        "pal_unroll": (
            jax.jit(pal_unroll),
            (x0, g[0], *[pw[i] for i in range(L)], *[sw[i] for i in range(L)]),
        ),
    }

    fns = {}
    for name, (f, args) in cases.items():
        t0 = time.time()
        np.asarray(f(*args))
        print(f"[probe] {name}: compile+first {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        fns[name] = (f, args)

    def timed(f, args, reps):
        x = args[0]
        t0 = time.time()
        for _ in range(reps):
            x = f(x, *args[1:])
        np.asarray(x)
        return time.time() - t0

    # Slope timing: t(R) = C_readback + R * per_call; slope cancels the
    # relay's readback/dispatch constant that poisoned absolute numbers.
    R_LO, R_HI = 2, 10
    for rnd in range(3):
        line = []
        for name, (f, args) in fns.items():
            t_lo = timed(f, args, R_LO)
            t_hi = timed(f, args, R_HI)
            us = (t_hi - t_lo) / (R_HI - R_LO) / L * 1e6
            line.append(f"{name}={us:.0f}us")
        print(f"round {rnd + 1} (slope): " + "  ".join(line), flush=True)


if __name__ == "__main__":
    main()
