#!/usr/bin/env python
"""Per-preset accuracy table on the TRAINED MoE anchor.

The MoE counterpart of tools/accuracy_table.py: for each preset, quantize
the trained `artifacts/anchor-moe` via the family pipeline (max /
smoothquant / awq_lite / gptq calibration as the preset's algorithm
dictates) and report held-out Δppl. One JSON line per preset on stdout;
markdown table on stderr.

Env: MOE_ANCHOR (artifacts/anchor-moe), MOE_PRESETS (comma list).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("MOE_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

ANCHOR = os.environ.get("MOE_ANCHOR", "artifacts/anchor-moe")
PRESETS = os.environ.get(
    "MOE_PRESETS",
    "FP8_DEFAULT_CFG,NVFP4_DEFAULT_CFG,NVFP4_KV_CFG,INT8_DEFAULT_CFG,"
    "INT8_SMOOTHQUANT_CFG,INT4_AWQ_CFG,INT4_GPTQ_CFG,"
    "INT4_BLOCKWISE_WEIGHT_ONLY_CFG,MXFP4_DEFAULT_CFG,MXFP8_DEFAULT_CFG,"
    "W4A8_AWQ_BETA_CFG,NF4_WEIGHT_ONLY_CFG,NVFP4_AWQ_LITE_CFG",
).split(",")


def main():
    from tensorrt_model_optimizer_tpu.models import hf_loader, mixtral
    from tensorrt_model_optimizer_tpu.quant import ptq
    from tensorrt_model_optimizer_tpu.utils import synthlang
    from tensorrt_model_optimizer_tpu.utils.evaluate import perplexity

    cfg, params = hf_loader.load_hf_moe_checkpoint(ANCHOR, dtype=jnp.float32)
    lang = synthlang.SynthLang(0)
    ev = list(lang.eval_batches(4, 8, 128, seed=999))
    calib = [jnp.asarray(b) for b in lang.eval_batches(4, 8, 128, seed=555)]
    base_ppl = perplexity(cfg, params, ev, forward_fn=mixtral.forward)
    print(f"[moe-table] bf16 ppl {base_ppl:.4f}", file=sys.stderr, flush=True)

    rows = []
    for preset in PRESETS:
        preset = preset.strip()
        try:
            model = ptq.quantize_family("mixtral", cfg, params, preset, calib)
            ppl = perplexity(cfg, model.params, ev, layout=model.layout,
                             qstate=model.qstate, forward_fn=mixtral.forward)
            row = {"preset": preset, "ppl": round(float(ppl), 4),
                   "dppl": round(float(ppl - base_ppl), 4),
                   "rel_pct": round(100 * float(ppl - base_ppl) / base_ppl, 2)}
        except NotImplementedError as e:
            row = {"preset": preset, "error": str(e)[:120]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        print(f"[moe-table] {row}", file=sys.stderr, flush=True)
    print(json.dumps({"baseline_ppl": round(float(base_ppl), 4),
                      "anchor": ANCHOR, "rows": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
