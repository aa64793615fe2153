#!/usr/bin/env python
"""Attention-sparsity accuracy artifact: RULER retrieval accuracy +
keep-fraction + long-context Δppl per skip-softmax threshold, on the
trained anchor (VERDICT r2 weak #9 / item #10).

Writes artifacts/ruler_curve.json with the full curve and the calibrated
safe operating point for `EngineConfig.attn_sparsity`.

Env: RULER_CTX (default 448 — near the anchor's 512 max positions),
RULER_N (default 64), RULER_CPU=1 to force CPU.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("RULER_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

CTX = int(os.environ.get("RULER_CTX", "448"))
N = int(os.environ.get("RULER_N", "64"))
OUT = os.environ.get("RULER_OUT", "artifacts/ruler_curve.json")


def main():
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader
    from tensorrt_model_optimizer_tpu.quant import compress
    from tensorrt_model_optimizer_tpu.serve.engine import EngineConfig
    from tensorrt_model_optimizer_tpu.sparsity import ruler
    from tensorrt_model_optimizer_tpu.utils import synthlang

    lang = synthlang.SynthLang(0)
    cfg, params = hf_loader.load_hf_checkpoint(
        os.environ.get("RULER_ANCHOR", "artifacts/anchor-llama"),
        dtype=jnp.float32
    )
    cm = compress.compress_bf16(cfg, params)
    ecfg = EngineConfig(max_seq_len=CTX + 16, backend="xla")

    thresholds = (1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1, 3e-1)
    # long-context eval streams for the dppl gate (computed inside the
    # curve sweep through the sparse prefill path)
    ev = list(lang.eval_batches(2, 8, CTX, seed=991))
    th, rows = ruler.calibrate_threshold_ruler(
        cm, ecfg, lang, max_acc_drop=0.02, min_dense_acc=0.8, max_dppl=0.05,
        thresholds=thresholds, n=N, ctx_tokens=CTX, blocks=(64, 64),
        ppl_batches=ev,
    )
    if th is None and rows and "calibration_invalid" in rows[0]:
        print(f"[ruler] NOT CALIBRATED: {rows[0]['calibration_invalid']}",
              flush=True)

    out = {
        "anchor": os.environ.get("RULER_ANCHOR", "artifacts/anchor-llama"),
        "gates": {"max_acc_drop": 0.02, "min_dense_acc": 0.8,
                  "max_dppl": 0.05},
        "ctx_tokens": CTX,
        "n_per_kind": N,
        "blocks": [64, 64],
        "calibrated_threshold": th,
        "curve": rows,
        "note": "calibrated_threshold is the safe operating point for "
                "EngineConfig.attn_sparsity at this context/block size; "
                "RULER tasks per sparsity/ruler.py (override/multikey/"
                "memory).",
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[ruler] calibrated threshold: {th}; wrote {OUT}")


if __name__ == "__main__":
    main()
