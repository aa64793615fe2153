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

    import dataclasses

    from tensorrt_model_optimizer_tpu.models import hf_loader
    from tensorrt_model_optimizer_tpu.quant import compress
    from tensorrt_model_optimizer_tpu.serve.engine import Engine, EngineConfig
    from tensorrt_model_optimizer_tpu.sparsity import ruler
    from tensorrt_model_optimizer_tpu.utils import synthlang
    from tensorrt_model_optimizer_tpu.utils.evaluate import perplexity

    lang = synthlang.SynthLang(0)
    cfg, params = hf_loader.load_hf_checkpoint(
        "artifacts/anchor-llama", dtype=jnp.float32
    )
    cm = compress.compress_bf16(cfg, params)
    ecfg = EngineConfig(max_seq_len=CTX + 16, backend="xla")

    thresholds = (1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1, 3e-1)
    th, rows = ruler.calibrate_threshold_ruler(
        cm, ecfg, lang, max_acc_drop=0.02, thresholds=thresholds,
        n=N, ctx_tokens=CTX, blocks=(64, 64),
    )

    # long-context Δppl per threshold: ppl of eval streams computed through
    # the engine's SPARSE prefill logits (full-sequence scoring)
    ev = list(lang.eval_batches(2, 8, CTX, seed=991))
    ppl_dense = None
    for row in rows:
        ecfg_t = dataclasses.replace(
            ecfg, attn_sparsity=row["threshold"], attn_sparsity_blocks=(64, 64)
        )
        eng = Engine(cm, ecfg_t)
        ppl = _prefill_ppl(eng, ev)
        row["ppl"] = ppl
        if row["threshold"] is None:
            ppl_dense = ppl
        row["dppl"] = None if ppl_dense is None else round(ppl - ppl_dense, 4)
        print(f"[ruler] th={row['threshold']}: keep={row['keep_frac']}, "
              f"acc_override={row.get('acc_override'):.3f}, "
              f"acc_multikey={row.get('acc_multikey'):.3f}, "
              f"acc_memory={row.get('acc_memory'):.3f}, ppl={ppl:.4f}",
              flush=True)

    out = {
        "anchor": "artifacts/anchor-llama",
        "ctx_tokens": CTX,
        "n_per_kind": N,
        "blocks": [64, 64],
        "calibrated_threshold": th,
        "max_acc_drop": 0.02,
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


def _prefill_ppl(eng, batches):
    """Full next-token ppl over eval streams through the engine's PREFILL
    path (the sparse-attention path when attn_sparsity is set), via
    `_model_step(full_logits=True)` — every position teacher-force-scored
    in one forward per batch."""
    import functools

    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.serve import engine as E

    step = jax.jit(functools.partial(
        E._model_step, eng._fwd_cfg, eng.ecfg, eng.cm, eng.backend,
        full_logits=True,
        sparse_prefill=eng.ecfg.attn_sparsity is not None,
    ))
    tot, cnt = 0.0, 0
    for batch in batches:
        toks = jnp.asarray(batch)
        B, T = toks.shape
        cache = eng.init_cache(B, T + 8)
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(
            jnp.int32)
        out = step(eng.cm.params, eng.cm.qstate, toks, cache, positions)
        logits = out[0]  # [B, T, V]
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        tot += float(jnp.sum(nll))
        cnt += int(tgt.size)
    return float(np.exp(tot / max(cnt, 1)))


if __name__ == "__main__":
    main()
