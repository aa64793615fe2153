#!/usr/bin/env python
"""Serving demo: quantize -> export -> load -> continuous-batching serve.

The full deploy loop on a tiny model (or a real HF checkpoint with --model):
the analog of pointing TRT-LLM/vLLM at a ModelOpt checkpoint, except the
engine is this framework's own.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--qformat", default="INT8_SMOOTHQUANT_CFG")
    ap.add_argument("--num_requests", type=int, default=4)
    ap.add_argument("--max_new_tokens", type=int, default=8)
    ap.add_argument("--paged_kernel", action="store_true")
    ap.add_argument("--prefix_cache", action="store_true",
                    help="share identical prompt-prefix pages across requests")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.export import hf_export
    from tensorrt_model_optimizer_tpu.models import hf_loader, llama
    from tensorrt_model_optimizer_tpu.quant import ptq
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine
    from tensorrt_model_optimizer_tpu.serve import loader
    from tensorrt_model_optimizer_tpu.serve.scheduler import Request
    from tensorrt_model_optimizer_tpu.utils import dataset

    if args.model == "tiny":
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg, params = hf_loader.load_hf_checkpoint(args.model)

    batches = [jnp.asarray(b) for b in dataset.get_calib_batches(
        cfg.vocab_size, num_batches=4, seq_len=64)]
    model = ptq.quantize(cfg, params, args.qformat, batches)
    print(f"[serve_demo] quantized with {args.qformat}", flush=True)

    with tempfile.TemporaryDirectory() as tmp:
        qc = hf_export.export_hf_checkpoint(model, tmp)
        print(f"[serve_demo] exported {qc['quantization']['quant_algo']}", flush=True)
        cm = loader.load_quantized_checkpoint(tmp)
    eng = serve_engine.Engine(
        cm,
        serve_engine.EngineConfig(
            max_seq_len=256, backend="xla",
            paged_attention_kernel=args.paged_kernel,
        ),
    )

    rng = np.random.default_rng(0)
    reqs = [
        Request(rid=i,
                prompt=rng.integers(0, cfg.vocab_size, size=(6 + i,)).astype(np.int32),
                max_new_tokens=args.max_new_tokens)
        for i in range(args.num_requests)
    ]
    outs = eng.serve(reqs, n_pages=64, page_size=16, max_slots=2,
                     max_pages_per_seq=8, prefix_cache=args.prefix_cache)
    for rid in sorted(outs):
        print(f"[serve_demo] request {rid}: {outs[rid]}", flush=True)
    print("[serve_demo] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
