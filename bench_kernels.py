#!/usr/bin/env python
"""Kernel microbenchmarks: fused dequant-matmul GB/s at llama-8B shapes.

Timing methodology for the remote-relay TPU: N iterations chained inside ONE
jit via lax.fori_loop with a data dependency (output perturbs input), so
neither dispatch overhead nor any relay-side caching pollutes the number.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.ops.pallas import qmm

    O, K = 14336, 4096
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ITERS = 16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)

    def chain(fn_one):
        """Run fn_one ITERS times with a forced dependency chain, in one jit.

        Weights are explicit jit ARGUMENTS — captured constants get embedded
        in the program and are not guaranteed device-resident on this
        backend (observed 60 GB/s vs 3 TB/s for the same matmul).
        """

        def run(x, *ws):
            def body(i, x):
                y = fn_one(x, *ws)  # [B, O]
                # fold output back into x (tiny VPU work, forces ordering)
                delta = (y[:, :1] * 1e-6).astype(x.dtype)
                return x + delta
            return jax.lax.fori_loop(0, ITERS, body, x)

        return jax.jit(run)

    results = {}

    def measure(name, fn_one, weight_bytes, *ws):
        try:
            f = chain(fn_one)
            r = f(x0, *ws)
            _ = np.asarray(r)  # VALUE readback: compile + first (the relay's
            # block_until_ready can return at dispatch time — memory notes)
            t0 = time.time()
            r = f(x0, *ws)
            _ = np.asarray(r)
            dt = (time.time() - t0) / ITERS
            gbs = weight_bytes / dt / 1e9
            results[name] = {"us": round(dt * 1e6, 1), "GBps": round(gbs, 1)}
            print(f"{name:16s} {dt*1e6:9.1f} us  {gbs:8.1f} GB/s", file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:160]}
            print(f"{name:16s} FAIL {str(e)[:160]}", file=sys.stderr, flush=True)

    Wb = jnp.asarray(rng.normal(size=(O, K)) * 0.02, jnp.bfloat16)
    measure("bf16_xla", lambda x, w: x @ w.T, O * K * 2, Wb)

    W8 = jnp.asarray(rng.integers(-127, 127, size=(O, K), dtype=np.int8))
    s8 = jnp.full((O, 1), 1e-3, jnp.float32)
    measure("int8_pallas", lambda x, w, s: qmm.qmm_int8(x, w, s), O * K, W8, s8)
    measure(
        "int8_xla",
        lambda x, w, s: x @ (w.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)).T,
        O * K, W8, s8,
    )

    Wp = jnp.asarray(rng.integers(0, 256, size=(O // 2, K), dtype=np.uint8))
    sl = jnp.full((O // 2, K // 128), 1e-3, jnp.float32)
    measure("int4_pallas", lambda x, w, a, b: qmm.qmm_int4(x, w, a, b), O * K // 2, Wp, sl, sl)

    slf4 = jnp.full((O // 2, K // 16), 1.0, jnp.float32)
    gs = jnp.asarray(1e-3, jnp.float32)
    measure("nvfp4_pallas", lambda x, w, a, b, g: qmm.qmm_nvfp4(x, w, a, b, g), O * K // 2, Wp, slf4, slf4, gs)

    slb = slf4.astype(jnp.bfloat16)
    measure("nvfp4_perm", lambda x, w, a, b, g: qmm.qmm_nvfp4_perm(x, w, a, b, g),
            O * K // 2, Wp, slb, slb, gs)

    # word-domain SWAR decode (row-pair bytes); random bytes are valid codes
    Ww, sw = qmm.nvfp4_word_pack(Wp, slf4, slf4)
    measure("nvfp4_word", lambda x, w, s, g: qmm.qmm_nvfp4_word(x, w, s, g),
            O * K // 2, Ww, sw, gs)

    Wi, si = qmm.int4_word_pack(Wp, sl, sl)
    measure("int4_word", lambda x, w, s: qmm.qmm_int4_word(x, w, s),
            O * K // 2, Wi, si)

    # round-3 layouts (serving options): 4-bytes-per-lane word2 decode and
    # the block-major batched-dot bd2 with post-dot scales
    Wi2, si2 = qmm.int4_word2_pack(Wp, sl, sl)
    measure("int4_word2", lambda x, w, s: qmm.qmm_int4_word2(x, w, s),
            O * K // 2, Wi2, si2)
    Wb2, sb2 = qmm.int4_bd2_pack(Wp, sl, sl)
    measure("int4_bd2", lambda x, w, s: qmm.qmm_int4_bd2(x, w, s),
            O * K // 2, Wb2, sb2)
    W42, s42 = qmm.nvfp4_word2_pack(Wp, slf4, slf4)
    measure("nvfp4_word2", lambda x, w, s, g: qmm.qmm_nvfp4_word2(x, w, s, g),
            O * K // 2, W42, s42, gs)

    Wf8 = jnp.asarray((rng.normal(size=(O, K)) * 0.1).astype(np.float32)).astype(jnp.float8_e4m3fn)
    measure("fp8_pallas", lambda x, w, s: qmm.qmm_fp8(x, w, s), O * K, Wf8, s8)

    print(json.dumps({"bs": B, "shapes": [O, K], **results}))


if __name__ == "__main__":
    main()
