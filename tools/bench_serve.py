#!/usr/bin/env python
"""Continuous-batching serving benchmark.

Measures end-to-end tokens/s through Engine.serve (scheduler + paged KV +
quantized decode) on a synthetic request mix, optionally with prefix caching
(shared system prompt). The reference delegates serving to TRT-LLM; this is
the in-framework equivalent measurement.

  python tools/bench_serve.py --format int4 --requests 16 --prefix_cache
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", default="int4")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--prompt_len", type=int, default=96)
    ap.add_argument("--shared_prefix", type=int, default=64,
                    help="tokens of identical system prompt across requests")
    ap.add_argument("--new_tokens", type=int, default=32)
    ap.add_argument("--max_slots", type=int, default=8)
    ap.add_argument("--prefix_cache", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--llama8b", action="store_true",
                    help="full llama3.1-8B geometry (overrides layers/hidden)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="multi-step scheduling block size")
    ap.add_argument("--kv", default=None, choices=[None, "int8", "fp8"],
                    help="quantized KV cache dtype")
    ap.add_argument("--layout", default=None,
                    help="int4/nvfp4 serving layout override (e.g. a8)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench as bench_mod
    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.quant.compress import CompressedModel
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine
    from tensorrt_model_optimizer_tpu.serve.scheduler import Request

    if args.llama8b:
        cfg = llama.LlamaConfig.llama3_8b()
    else:
        cfg = llama.LlamaConfig(
            vocab_size=32000, hidden_size=args.hidden,
            intermediate_size=args.hidden * 11 // 4 // 8 * 8,
            num_hidden_layers=args.layers,
            num_attention_heads=args.hidden // 128,
            num_key_value_heads=max(args.hidden // 512, 1),
            dtype=jnp.bfloat16,
        )
    rng = np.random.default_rng(0)
    layers, kinds = bench_mod.synth_packed_layers(cfg, args.format, rng)
    h = cfg.hidden_size
    params = {
        "embed_tokens": jnp.asarray(
            rng.normal(scale=0.01, size=(cfg.vocab_size, h)).astype(np.float32),
            cfg.dtype),
        "norm": jnp.ones((h,), cfg.dtype),
        "layers": layers,
    }
    params["lm_head"] = params["embed_tokens"]
    preset = {"int4": "INT4_AWQ_CFG", "nvfp4": "NVFP4_WEIGHT_ONLY_CFG",
              "fp8": "FP8_DEFAULT_CFG", "int8": "INT8_DEFAULT_CFG",
              "bf16": "INT4_AWQ_CFG"}[args.format]
    from tensorrt_model_optimizer_tpu.quant.config import get_preset

    cm = CompressedModel(cfg, params, kinds,
                         llama.build_layout(cfg, get_preset(preset)), {})
    ecfg = serve_engine.EngineConfig(
        max_seq_len=args.prompt_len + args.new_tokens + 16, backend="pallas",
        paged_attention_kernel=True)
    import dataclasses as _dc
    if args.kv:
        ecfg = _dc.replace(ecfg, kv_dtype={
            "int8": jnp.int8, "fp8": jnp.float8_e4m3fn}[args.kv])
    if args.layout:
        ecfg = _dc.replace(ecfg, int4_layout=args.layout,
                           nvfp4_layout=args.layout
                           if args.format == "nvfp4" else ecfg.nvfp4_layout)
    eng = serve_engine.Engine(cm, ecfg)

    prefix = rng.integers(0, 32000, args.shared_prefix).astype(np.int32)
    reqs = []
    for i in range(args.requests):
        tail = rng.integers(0, 32000,
                            args.prompt_len - args.shared_prefix).astype(np.int32)
        reqs.append(Request(rid=i, prompt=np.concatenate([prefix, tail]),
                            max_new_tokens=args.new_tokens))

    page = 16
    need = (args.prompt_len + args.new_tokens) // page + 2
    t0 = time.time()
    outs, metrics = eng.serve(
        reqs, n_pages=args.max_slots * need + 8, page_size=page,
        max_slots=args.max_slots, max_pages_per_seq=need + 1,
        prefix_cache=args.prefix_cache, unroll=args.unroll,
        collect_metrics=True)
    dt = time.time() - t0
    total_new = sum(len(v) for v in outs.values())
    print(json.dumps({
        "metric": f"serve-{args.format}-tok/s",
        "value": round(total_new / dt, 1),
        "unit": "tok/s",
        "requests": args.requests, "new_tokens_total": total_new,
        "wall_s": round(dt, 2), "prefix_cache": args.prefix_cache,
        "prompt_len": args.prompt_len, "shared_prefix": args.shared_prefix,
        "model": ("llama3.1-8b" if args.llama8b
                  else f"L{args.layers}xH{args.hidden}"),
        "kv": args.kv, "layout": args.layout,
        "ttft_p50_s": round(metrics["ttft_p50_s"], 3),
        "ttft_p95_s": round(metrics["ttft_p95_s"], 3),
        "slot_utilization": round(metrics["slot_utilization"], 3),
        "unroll": args.unroll,
        "decode_dispatches": metrics["decode_dispatches"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
