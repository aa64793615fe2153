#!/usr/bin/env python
"""VLM PTQ example: quantize a LLaVA-style vision+LM model end to end.

Reference analog: `/root/reference/examples/vlm_ptq/` — quantize the
language tower (and optionally the vision tower) of a vision-language
model with a calibration set of (image, text) pairs, then check the
quantized model still conditions on the image.

  python examples/vlm_ptq.py --qformat NVFP4_DEFAULT_CFG
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qformat", default="NVFP4_DEFAULT_CFG")
    ap.add_argument("--calib_batches", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.models import vlm
    from tensorrt_model_optimizer_tpu.utils.dataset import vlm_calib_batches

    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    calib = [(jnp.asarray(px), jnp.asarray(tk))
             for px, tk in vlm_calib_batches(args.calib_batches)]
    print(f"[vlm_ptq] model: ViT {cfg.vision.depth}L/{cfg.vision.hidden_size}h"
          f" + LM {cfg.lm.num_hidden_layers}L/{cfg.lm.hidden_size}h")

    px, tk = calib[0]
    ref, _ = vlm.forward(cfg, params, px, tk)
    t0 = time.time()
    layout, qstate = vlm.quantize_vlm(cfg, params, args.qformat, calib)
    out, _ = vlm.forward(cfg, params, px, tk, layout=layout, qstate=qstate)
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(out).ravel())[0, 1]
    print(f"[vlm_ptq] quantized ({args.qformat}) in {time.time()-t0:.1f}s; "
          f"logits corr vs bf16 {corr:.4f}")

    # image conditioning survives quantization
    px2 = jnp.asarray(np.roll(np.asarray(px), 7, axis=1))
    out2, _ = vlm.forward(cfg, params, px2, tk, layout=layout, qstate=qstate)
    delta = float(np.abs(np.asarray(out) - np.asarray(out2)).max())
    print(f"[vlm_ptq] image-conditioning delta (quantized): {delta:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
