#!/usr/bin/env python
"""Diffusion PTQ demo — the `examples/diffusers/quantization` equivalent.

Quantizes both diffusion backbones (DiT and UNet) with a chosen preset,
reports quantized-vs-bf16 output correlation, and runs a few-step DDIM
sample through the quantized model. Optionally runs a DMD2 critic step to
show the fastgen training path.

  python examples/diffusion_ptq.py --backbone unet --qformat FP8_DEFAULT_CFG
  python examples/diffusion_ptq.py --backbone dit --qformat NVFP4_DEFAULT_CFG --dmd
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", choices=["dit", "unet"], default="unet")
    ap.add_argument("--qformat", default="FP8_DEFAULT_CFG")
    ap.add_argument("--steps", type=int, default=4, help="DDIM sample steps")
    ap.add_argument("--dmd", action="store_true", help="run one DMD2 critic step")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    rng = np.random.default_rng(0)

    if args.backbone == "dit":
        from tensorrt_model_optimizer_tpu.models import dit as M

        cfg = M.DiTConfig.tiny()
        params = M.init_params(cfg, jax.random.PRNGKey(0))
        # adaLN-zero init makes the output ~0; seed the final proj so the
        # quantization comparison is meaningful
        params = dict(params)
        params["final_proj"] = jax.random.normal(
            jax.random.PRNGKey(9), params["final_proj"].shape, jnp.float32
        ).astype(params["final_proj"].dtype) * 0.1
        x = jnp.asarray(rng.normal(size=(2, cfg.img_size, cfg.img_size,
                                         cfg.in_channels)).astype(np.float32))
        t = jnp.asarray([100, 700])
        layout, qstate = M.quantize_dit(cfg, params, args.qformat, [(x, t)])
        ref, _ = M.forward(cfg, params, x, t)
        out, _ = M.forward(cfg, params, x, t, layout=layout, qstate=qstate)
    else:
        from tensorrt_model_optimizer_tpu.models import unet as M

        cfg = M.UNetConfig.tiny()
        params = M.init_params(cfg, jax.random.PRNGKey(0))
        params = dict(params)
        params["conv_out"] = jax.random.normal(
            jax.random.PRNGKey(9), params["conv_out"].shape, jnp.float32) * 0.1
        x = jnp.asarray(rng.normal(size=(2, 8, 8, cfg.in_channels)).astype(np.float32))
        t = jnp.asarray([100, 700])
        layout, qstate = M.quantize_unet(cfg, params, args.qformat, [(x, t)])
        ref, _ = M.forward(cfg, params, x, t)
        out, _ = M.forward(cfg, params, x, t, layout=layout, qstate=qstate)

    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
    print(f"[diffusion_ptq] {args.backbone} quantized ({args.qformat}) "
          f"in {time.time()-t0:.1f}s, corr={corr:.4f}", flush=True)

    # few-step DDIM through the quantized model
    h = x
    for i, ti in enumerate(np.linspace(900, 0, args.steps).astype(int)):
        eps, _ = M.forward(cfg, params, h,
                           jnp.full((h.shape[0],), int(ti)),
                           layout=layout, qstate=qstate)
        h = h - 0.1 * eps
    print(f"[diffusion_ptq] {args.steps}-step DDIM sample finite: "
          f"{bool(np.isfinite(np.asarray(h)).all())}", flush=True)

    if args.dmd and args.backbone == "dit":
        from tensorrt_model_optimizer_tpu.fastgen import dmd as D

        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        student = M.init_params(cfg, ks[0])
        fake = M.init_params(cfg, ks[1])
        disc = D.init_discriminator(cfg, D.DiscriminatorConfig(), ks[2])
        noise = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        sl, fsl, dl = D.make_dmd_losses(cfg, D.DMDConfig(gan_loss_weight_gen=1e-2))
        (total, parts), _ = jax.value_and_grad(sl, has_aux=True)(
            student, params, fake, disc, noise, ks[3])
        print(f"[diffusion_ptq] DMD student loss {float(total):.4f} "
              f"(vsd {float(parts['vsd']):.4f}, gan {float(parts['gan_gen']):.4f})",
              flush=True)
    print("[diffusion_ptq] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
