#!/usr/bin/env python
"""Sparsity example — `examples/llm_sparsity` analog: 2:4 sparsify
(magnitude or SparseGPT), report ppl delta, optionally compose with PTQ."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--method", default="sparsegpt", choices=["magnitude", "sparsegpt"])
    ap.add_argument("--pattern", default="2:4")
    ap.add_argument("--qformat", default=None, help="optional PTQ after sparsify")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama
    from tensorrt_model_optimizer_tpu.sparsity import sparsify
    from tensorrt_model_optimizer_tpu.utils import dataset, evaluate

    if args.model == "tiny":
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg, params = hf_loader.load_hf_checkpoint(args.model)
    n, m = (int(x) for x in args.pattern.split(":"))
    batches = [jnp.asarray(b) for b in dataset.get_calib_batches(
        cfg.vocab_size, num_batches=4, seq_len=64)]

    ppl0 = evaluate.perplexity(cfg, params, batches[:2])
    sp_params, masks = sparsify.sparsify(cfg, params, args.method, (n, m), batches)
    ppl1 = evaluate.perplexity(cfg, sp_params, batches[:2])
    print(f"[llm_sparsity] {args.method} {n}:{m} ppl {ppl0:.3f} -> {ppl1:.3f}", flush=True)

    if args.qformat:
        from tensorrt_model_optimizer_tpu.quant import ptq

        model = ptq.quantize(cfg, sp_params, args.qformat, batches)
        ppl2 = evaluate.perplexity(
            cfg, model.params, batches[:2], layout=model.layout, qstate=model.qstate
        )
        print(f"[llm_sparsity] + {args.qformat}: ppl {ppl2:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
