#!/usr/bin/env python
"""Paged-serving benchmark: continuous-batching decode on one chip.

Measures steady-state paged decode throughput (all slots busy) for the
8B-architecture engine with int4 weights, with and without the Pallas
paged-attention kernel. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import synth_packed_layers
    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.quant.compress import CompressedModel
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine

    use_kernel = os.environ.get("PAGED_KERNEL", "1") == "1"
    slots = int(os.environ.get("PAGED_SLOTS", "8"))
    page = int(os.environ.get("PAGED_PAGE", "64"))
    ctx = int(os.environ.get("PAGED_CTX", "512"))
    steps = int(os.environ.get("PAGED_STEPS", "32"))

    cfg = llama.LlamaConfig.llama3_8b()
    rng = np.random.default_rng(0)
    layers, kinds = synth_packed_layers(cfg, "int4", rng)
    h = cfg.hidden_size
    params = {
        "embed_tokens": jnp.asarray(
            rng.normal(scale=0.01, size=(cfg.vocab_size, h)).astype(np.float32), cfg.dtype
        ),
        "layers": layers,
        "norm": jnp.ones((h,), cfg.dtype),
    }
    params["lm_head"] = params["embed_tokens"]
    cm = CompressedModel(cfg, params, kinds, llama.QuantLayout(sites=()), {})
    eng = serve_engine.Engine(
        cm,
        serve_engine.EngineConfig(
            max_seq_len=ctx + steps + page, backend="pallas",
            paged_attention_kernel=use_kernel,
        ),
    )
    max_pages = (ctx + steps) // page + 2
    n_pages = slots * max_pages + 2
    cache = eng.init_paged_cache(n_pages, page, slots, max_pages)
    # fill block tables + seq lens to steady state
    import dataclasses as dc

    bt = np.zeros((slots, max_pages), np.int32)
    pid = 1
    for s in range(slots):
        for i in range(max_pages):
            bt[s, i] = pid
            pid += 1
    cache = dc.replace(
        cache,
        block_table=jnp.asarray(bt),
        seq_lens=jnp.full((slots,), ctx, jnp.int32),
    )
    tok = jnp.zeros((slots, 1), jnp.int32)
    active = jnp.ones((slots,), bool)

    # fused multi-step blocks: `unroll` chained steps per dispatch with
    # on-device argmax + donated cache — the serving scheduler's regime
    # (scheduler bookkeeping runs BETWEEN blocks; page capacity through
    # ctx + steps is provisioned above). unroll=1 reproduces the round-2
    # host-stepped measurement for comparison.
    unroll = int(os.environ.get("PAGED_UNROLL", "8"))
    t0 = time.time()
    tok, cache = eng.paged_decode_step(tok, cache, active, unroll=unroll)
    _ = np.asarray(tok)  # VALUE readback: block_until_ready can return at
    # dispatch time on the relay (memory notes) — drain compile + first exec
    compile_s = time.time() - t0

    nblocks = max(steps // unroll, 1)
    t0 = time.time()
    for _ in range(nblocks):
        # tok of block i feeds block i+1: serialized like real decode
        tok, cache = eng.paged_decode_step(tok, cache, active, unroll=unroll)
    _ = np.asarray(tok)
    dt = (time.time() - t0) / (nblocks * unroll)
    print(json.dumps({
        "metric": f"llama3.1-8b-int4-paged-decode-tok/s-slots{slots}-ctx{ctx}",
        "value": round(slots / dt, 1),
        "unit": "tok/s",
        "step_ms": round(dt * 1e3, 2),
        "kernel": use_kernel,
        "page": page,
        "unroll": unroll,
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
