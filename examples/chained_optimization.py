#!/usr/bin/env python
"""Chained optimizations — the `examples/chained_optimizations` analog:
sparsify -> distill-heal -> quantize -> export, with the opt-state trail
recorded at each stage (the reference's mto.save replay semantics).

  python examples/chained_optimization.py --cpu
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sparsity", default="magnitude", choices=["magnitude", "sparsegpt"])
    ap.add_argument("--qformat", default="FP8_DEFAULT_CFG")
    ap.add_argument("--heal_steps", type=int, default=10)
    ap.add_argument("--export_path", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.distill import distillation
    from tensorrt_model_optimizer_tpu.export import hf_export
    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.quant import ptq
    from tensorrt_model_optimizer_tpu.sparsity import sparsify as sp
    from tensorrt_model_optimizer_tpu.utils import evaluate

    cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)))
               for _ in range(4)]
    ppl0 = evaluate.perplexity(cfg, params, batches[:2])
    print(f"[chained] dense ppl {ppl0:.2f}", flush=True)

    # 1. sparsify (2:4)
    t0 = time.time()
    sparse_params, masks = sp.sparsify(cfg, params, args.sparsity, (2, 4), batches)
    ppl1 = evaluate.perplexity(cfg, sparse_params, batches[:2])
    print(f"[chained] 2:4 {args.sparsity} ppl {ppl1:.2f} "
          f"({time.time()-t0:.1f}s)", flush=True)

    # 2. distillation healing (teacher = dense model), masks re-projected
    step = jax.jit(distillation.make_distill_step(cfg, lr=1e-3))
    healed = sparse_params
    for _ in range(args.heal_steps):
        healed, loss = step(healed, params, batches[0])
        healed = sp.reapply(healed, masks)
    for name, m in masks.items():
        nz = np.asarray(healed["layers"][name]) * (1 - np.asarray(m))
        assert np.abs(nz).max() == 0, "healing broke the sparsity mask"
    ppl2 = evaluate.perplexity(cfg, healed, batches[:2])
    print(f"[chained] healed ppl {ppl2:.2f} (loss {float(loss):.3f}, "
          f"masks intact)", flush=True)

    # 3. quantize the healed sparse model
    model = ptq.quantize(cfg, healed, args.qformat, batches[:2])
    ppl3 = evaluate.perplexity(cfg, model.params, batches[:2],
                               layout=model.layout, qstate=model.qstate,
                               adapters=model.adapters)
    print(f"[chained] sparse+quantized ({args.qformat}) ppl {ppl3:.2f}", flush=True)

    # 4. export the final checkpoint
    out = args.export_path or tempfile.mkdtemp(prefix="chained_")
    qc = hf_export.export_hf_checkpoint(model, out)
    print(f"[chained] exported {qc['quantization']['quant_algo']} -> {out}", flush=True)
    print("[chained] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
