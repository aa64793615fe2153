#!/usr/bin/env python
"""Tile-size + variant sweep for the int4 fused dequant-matmul kernel.

Writes the best (TILE_O, TILE_K) to stdout; qmm.py constants are updated by
hand from this (keep the kernel source free of autotuner state).
"""

import functools
import itertools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    O, K = 14336, 4096
    B = 8
    ITERS = 16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    Wp = jnp.asarray(rng.integers(0, 256, size=(O // 2, K), dtype=np.uint8))
    bsz = 128
    sl = jnp.full((K // bsz, O // 2), 1e-3, jnp.float32)  # transposed

    def make(to, tk, variant):
        nblk = tk // bsz
        O2 = O // 2

        def kern(x_ref, w_ref, sl_ref, sh_ref, lo_ref, hi_ref, accl, acch):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                accl[:] = jnp.zeros_like(accl)
                acch[:] = jnp.zeros_like(acch)

            p32 = w_ref[:].astype(jnp.int32)
            lo = (((p32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
            hi = ((((p32 >> 4) & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
            if variant == "blockdot":
                for b in range(nblk):
                    xs = x_ref[:, b * bsz : (b + 1) * bsz]
                    accl[:] += jax.lax.dot_general(
                        xs, lo[:, b * bsz : (b + 1) * bsz],
                        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                    ) * sl_ref[b, :].astype(jnp.float32)[None, :]
                    acch[:] += jax.lax.dot_general(
                        xs, hi[:, b * bsz : (b + 1) * bsz],
                        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                    ) * sh_ref[b, :].astype(jnp.float32)[None, :]
            else:  # elementwise scale expand then one dot
                s_lo = pltpu.repeat(sl_ref[:].astype(jnp.float32), bsz, axis=0).T
                s_hi = pltpu.repeat(sh_ref[:].astype(jnp.float32), bsz, axis=0).T
                lof = lo.astype(jnp.float32) * s_lo
                hif = hi.astype(jnp.float32) * s_hi
                accl[:] += jax.lax.dot_general(
                    x_ref[:].astype(jnp.float32), lof,
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                acch[:] += jax.lax.dot_general(
                    x_ref[:].astype(jnp.float32), hif,
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                lo_ref[:] = accl[:].astype(lo_ref.dtype)
                hi_ref[:] = acch[:].astype(hi_ref.dtype)

        def call(x, w, s):
            return pl.pallas_call(
                kern,
                grid=(O2 // to, K // tk),
                in_specs=[
                    pl.BlockSpec((B, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((to, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk, to), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk, to), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((B, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B, O2), x.dtype),
                    jax.ShapeDtypeStruct((B, O2), x.dtype),
                ),
                scratch_shapes=[
                    pltpu.VMEM((B, to), jnp.float32),
                    pltpu.VMEM((B, to), jnp.float32),
                ],
            )(x, w, s, s)

        def run(x, w, s):
            def body(i, x):
                lo, hi = call(x, w, s)
                return x + (lo[:, :1] * 1e-6).astype(x.dtype)
            return jax.lax.fori_loop(0, ITERS, body, x)

        return jax.jit(run)

    results = {}
    for to, tk, variant in itertools.product(
        (128, 256, 512), (1024, 2048, 4096), ("blockdot", "ewise")
    ):
        if (O // 2) % to or K % tk:
            continue
        name = f"{variant}_to{to}_tk{tk}"
        try:
            f = make(to, tk, variant)
            r = f(x0, Wp, sl)
            jax.block_until_ready(r)
            t0 = time.time()
            r = f(x0, Wp, sl)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / ITERS
            results[name] = round(dt * 1e6, 1)
            print(f"{name:24s} {dt*1e6:8.1f} us", file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = f"FAIL {str(e)[:80]}"
            print(f"{name:24s} FAIL {str(e)[:80]}", file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
