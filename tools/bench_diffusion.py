#!/usr/bin/env python
"""Diffusion PTQ end-to-end: DiT denoise-step latency + quality proxy.

Reference analog: SDXL INT8/FP8 PTQ latency speedups + quality metrics
(`/root/reference/examples/benchmark.md:47-51`, `examples/windows/
Benchmark.md` FVD/CLIP). TPU-native measurement on the DiT family:

 - Model: DiT-XL/2-class geometry (hidden 1152, depth 28, heads 16,
   patch 2, 32x32x4 latents — the SD-latent shape), random weights (no
   public diffusion checkpoint in-image; latency is weight-value-free and
   the quality PROXY is quantized-vs-bf16 trajectory divergence, which is
   exactly the part PTQ controls).
 - Latency: jitted denoise step (B latents), deterministic x <- x - 0.1*eps
   update chaining steps (also defeats relay replay-caching); median of
   timed blocks, bf16 vs INT8 (W8A8) vs FP8 real-quant (forward_packed).
 - Quality proxy: per-step eps relative error vs the bf16 trajectory and
   the relative drift of x after DIFF_TRAJ steps (both computed from the
   same x0).

Env: DIFF_CPU=1 (CPU), DIFF_BS (8), DIFF_STEPS timed steps per block (16),
DIFF_TRAJ (12), DIFF_DEPTH (28), DIFF_HIDDEN (1152).
One JSON line per format on stdout.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("DIFF_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

BS = int(os.environ.get("DIFF_BS", "8"))
STEPS = int(os.environ.get("DIFF_STEPS", "16"))
TRAJ = int(os.environ.get("DIFF_TRAJ", "12"))
DEPTH = int(os.environ.get("DIFF_DEPTH", "28"))
HIDDEN = int(os.environ.get("DIFF_HIDDEN", "1152"))


def log(m):
    print(f"[diffusion] {m}", file=sys.stderr, flush=True)


def timed_traj(step_fn, x0, t, n, reps=3):
    """Median wall time per step for n chained steps; returns (ms, x_end)."""
    times = []
    x_end = None
    for _ in range(reps):
        x = x0
        t0 = time.time()
        for i in range(n):
            eps = step_fn(x, t)
            x = x - 0.1 * eps
        np.asarray(x[0, 0, 0, :2])  # value readback (relay-safe barrier)
        times.append((time.time() - t0) / n)
        x_end = x
    return sorted(times)[len(times) // 2] * 1e3, x_end


def main():
    from tensorrt_model_optimizer_tpu.models import dit

    cfg = dit.DiTConfig(img_size=32, patch_size=2, in_channels=4,
                        hidden_size=HIDDEN, depth=DEPTH,
                        num_heads=HIDDEN // 64, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    params = dit.init_params(cfg, jax.random.key(0))
    # DiT zero-inits adaLN modulation + final_proj (identity-at-init);
    # randomize them so the denoise output is non-degenerate and the
    # quantization quality proxy measures a real signal
    def _randn_like(a, scale):
        return jnp.asarray(
            rng.normal(scale=scale, size=a.shape).astype(np.float32), a.dtype)

    params["final_proj"] = _randn_like(params["final_proj"], 0.02)
    params["final_mod"] = _randn_like(params["final_mod"], 0.02)
    params["blocks"]["adaLN.mod"] = _randn_like(
        params["blocks"]["adaLN.mod"], 0.02)
    x0 = jnp.asarray(rng.normal(size=(BS, 32, 32, 4)).astype(np.float32),
                     cfg.dtype)
    t = jnp.asarray(rng.integers(0, 1000, BS).astype(np.int32))
    calib = [(jnp.asarray(rng.normal(size=(BS, 32, 32, 4)).astype(np.float32),
                          cfg.dtype),
              jnp.asarray(rng.integers(0, 1000, BS).astype(np.int32)))
             for _ in range(4)]

    bf16_step = jax.jit(lambda x, t: dit.forward(cfg, params, x, t)[0])
    bf16_step(x0, t)  # compile
    ms_bf16, x_bf16 = timed_traj(bf16_step, x0, t, STEPS)
    log(f"bf16: {ms_bf16:.2f} ms/step")
    # quality reference trajectory
    _, xq_ref = timed_traj(bf16_step, x0, t, TRAJ, reps=1)
    eps_ref = np.asarray(bf16_step(x0, t), np.float32)

    for preset, name in (("INT8_DEFAULT_CFG", "int8"),
                         ("FP8_DEFAULT_CFG", "fp8")):
        layout, qstate = dit.quantize_dit(cfg, params, preset, calib)
        kinds, packed = dit.compress_dit(cfg, params, layout, qstate)
        q_step = jax.jit(lambda x, tt: dit.forward_packed(
            cfg, params, kinds, packed, x, tt, layout=layout, qstate=qstate))
        q_step(x0, t)  # compile
        ms_q, _ = timed_traj(q_step, x0, t, STEPS)
        _, xq = timed_traj(q_step, x0, t, TRAJ, reps=1)
        eps_q = np.asarray(q_step(x0, t), np.float32)
        rel_eps = float(np.linalg.norm(eps_q - eps_ref)
                        / (np.linalg.norm(eps_ref) + 1e-9))
        drift = float(np.linalg.norm(
            np.asarray(xq, np.float32) - np.asarray(xq_ref, np.float32))
            / (np.linalg.norm(np.asarray(xq_ref, np.float32)) + 1e-9))
        print(json.dumps({
            "metric": f"dit-xl2-{name}-denoise-step",
            "value": round(ms_q, 2), "unit": "ms/step",
            "vs_bf16_speedup": round(ms_bf16 / ms_q, 3),
            "bf16_ms": round(ms_bf16, 2),
            "eps_rel_err_step0": round(rel_eps, 5),
            f"x_rel_drift_{TRAJ}steps": round(drift, 5),
            "bs": BS, "depth": DEPTH, "hidden": HIDDEN,
            "latent": "32x32x4 patch2",
        }))
        log(f"{name}: {ms_q:.2f} ms/step ({ms_bf16/ms_q:.2f}x), "
            f"eps err {rel_eps:.4f}, drift {drift:.4f}")


if __name__ == "__main__":
    main()
