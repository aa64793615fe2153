#!/usr/bin/env python
"""Skip-softmax prefill A/B on-chip: time delta + realized block-skip rate.

VERDICT round-1 item #8's bench line. Interleaved dense/sparse prefill of the
same prompts through the serving engine (value-readback timing per memory
notes), plus a logit-agreement probe at the calibrated threshold.

Env: SPARSE_SEQ (2048), SPARSE_BS (2), SPARSE_LAYERS (8), SPARSE_THRESH
(0 = calibrate from the prompt at SPARSE_TARGET sparsity), SPARSE_ROUNDS (4).
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEQ = int(os.environ.get("SPARSE_SEQ", "2048"))
BS = int(os.environ.get("SPARSE_BS", "2"))
LAYERS = int(os.environ.get("SPARSE_LAYERS", "8"))
THRESH = float(os.environ.get("SPARSE_THRESH", "0"))
TARGET = float(os.environ.get("SPARSE_TARGET", "0.4"))
ROUNDS = int(os.environ.get("SPARSE_ROUNDS", "4"))


def log(m):
    print(f"[sparse] {m}", file=sys.stderr, flush=True)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.quant.compress import CompressedModel
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine

    cfg = dataclasses.replace(
        llama.LlamaConfig.llama3_8b(), num_hidden_layers=LAYERS
    )
    params = llama.init_params(cfg, jax.random.key(0))
    cm = CompressedModel(
        cfg,
        {**params, "layers": {
            k: {"w": v.astype(jnp.bfloat16)} if k in llama.PROJ_NAMES
            else v
            for k, v in params["layers"].items()
        }},
        {k: "bf16" for k in llama.PROJ_NAMES},
        llama.QuantLayout(sites=()),
        {},
    )
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(BS, SEQ), dtype=np.int32)
    )

    thresh = THRESH
    if thresh == 0:
        # calibrate on the prompt through the jnp method (exact mask)
        from tensorrt_model_optimizer_tpu.sparsity.attention_sparsity import (
            calibrate_threshold)

        h = params["embed_tokens"][prompt[:1, :512]].astype(jnp.float32)
        thresh = calibrate_threshold(h[:, :, None, :], h[:, :, None, :],
                                     h[:, :, None, :], TARGET)
        log(f"calibrated threshold {thresh:.2e} for target sparsity {TARGET}")

    dense = serve_engine.Engine(
        cm, serve_engine.EngineConfig(max_seq_len=SEQ + 8, backend="xla")
    )
    sparse = serve_engine.Engine(
        cm, serve_engine.EngineConfig(max_seq_len=SEQ + 8, backend="xla",
                                      attn_sparsity=thresh),
    )

    def run(eng):
        cache = eng.init_cache(BS, SEQ + 8)
        t0 = time.time()
        logits, _ = eng.prefill(prompt, cache)
        v = np.asarray(logits)  # value readback = honest completion
        return (time.time() - t0) * 1e3, v

    # compile both
    run(dense)
    run(sparse)
    times_d, times_s = [], []
    for r in range(ROUNDS):
        td, vd = run(dense)
        ts, vs = run(sparse)
        times_d.append(td)
        times_s.append(ts)
        log(f"round {r}: dense {td:.1f} ms, sparse {ts:.1f} ms")
    keep = np.asarray(sparse.last_prefill_keep_frac)
    md = sorted(times_d)[len(times_d) // 2]
    ms = sorted(times_s)[len(times_s) // 2]
    corr = float(np.corrcoef(vd.ravel(), vs.ravel())[0, 1])
    print(json.dumps({
        "metric": "skip-softmax-prefill",
        "seq": SEQ, "bs": BS, "layers": LAYERS,
        "threshold": float(thresh),
        "dense_ms": round(md, 1), "sparse_ms": round(ms, 1),
        "speedup": round(md / ms, 3),
        "kept_block_frac": round(float(keep.mean()), 4),
        "logit_corr_vs_dense": round(corr, 5),
    }))


if __name__ == "__main__":
    main()
