#!/usr/bin/env python
"""Decode-step ablation: where does the time go, per weight format?

Interleaved same-session A/B (VERDICT round-1 item #1). For each format,
measures variants of the BS8 decode step on the real chip:

  step       current bench step: jit model step, host argmax, no donation
  fused      argmax inside jit + donated cache buffers
  fused_gqa  fused + grouped-query attention without jnp.repeat (K/V stay
             at n_kv heads through both einsums)
  gemm       projections only (scan over layers, 7 GEMMs each, chained) —
             isolates weight streaming
  noattn     fused_gqa with attention replaced by identity (ctx = q) —
             step minus attention/KV-cache cost
  nohead     fused_gqa without the lm_head matmul

Each variant is timed as: median of R repeats of (N host-loop steps with a
token->token data dependency). Variants are interleaved round-robin so pool
speed drift hits all equally; a final re-run of the first variant detects
residual drift.

Usage: ABLATE_FORMATS=bf16,int4 ABLATE_LAYERS=32 python tools/ablate_decode.py
"""

import json
import math
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FORMATS = os.environ.get("ABLATE_FORMATS", "bf16,int4,fp8,nvfp4,int8").split(",")
LAYERS = [int(x) for x in os.environ.get("ABLATE_LAYERS", "32").split(",")]
BATCH = int(os.environ.get("ABLATE_BS", "8"))
MAXLEN = int(os.environ.get("ABLATE_MAXLEN", "512"))
PREFILL = int(os.environ.get("ABLATE_PREFILL", "128"))
STEPS = int(os.environ.get("ABLATE_STEPS", "32"))
REPEATS = int(os.environ.get("ABLATE_REPEATS", "3"))
VARIANTS = os.environ.get(
    "ABLATE_VARIANTS", "step,fused,fused_gqa,gemm,noattn,nohead"
).split(",")


def log(msg):
    print(f"[ablate] {msg}", file=sys.stderr, flush=True)


def build_cm(cfg, fmt):
    import jax.numpy as jnp

    from bench import synth_packed_layers
    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.quant.compress import CompressedModel

    rng = np.random.default_rng(0)
    layers, kinds = synth_packed_layers(cfg, fmt, rng)
    h = cfg.hidden_size
    params = {
        "embed_tokens": jnp.asarray(
            rng.normal(scale=0.01, size=(cfg.vocab_size, h)).astype(np.float32),
            cfg.dtype,
        ),
        "layers": layers,
        "norm": jnp.ones((h,), cfg.dtype),
    }
    params["lm_head"] = params["embed_tokens"]
    return CompressedModel(cfg, params, kinds, llama.QuantLayout(sites=()), {})


def make_step(cfg, ecfg, cm, backend, variant):
    """Return jitted fn (params, qstate, tok, cache) -> (next_tok, cache)."""
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.serve.engine import _model_step, _qlinear

    if variant in ("step", "fused"):
        def fused(params, qstate, tok, cache):
            B = tok.shape[0]
            positions = jnp.broadcast_to(cache["pos"][None, None], (B, 1)).astype(jnp.int32)
            logits, cache = _model_step(cfg, ecfg, cm, backend, params, qstate, tok, cache, positions)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

        if variant == "fused":
            return jax.jit(fused, donate_argnums=(3,))
        # "step": argmax host-side, no donation (round-1 bench behavior)
        stepf = jax.jit(partial(_model_step, cfg, ecfg, cm, backend))

        def outer(params, qstate, tok, cache):
            B = tok.shape[0]
            positions = jnp.broadcast_to(cache["pos"][None, None], (B, 1)).astype(jnp.int32)
            logits, cache = stepf(params, qstate, tok, cache, positions)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

        return outer

    # custom step variants (share _qlinear; local layer body)
    kinds = cm.kinds
    hd, nH, nKV = cfg.hd, cfg.num_attention_heads, cfg.num_key_value_heads
    rep = nH // nKV
    eps = cfg.rms_norm_eps
    gemm_only = variant == "gemm"
    no_attn = variant == "noattn"
    no_head = variant == "nohead"

    def step(params, qstate, tok, cache):
        B, T = tok.shape
        x = params["embed_tokens"][tok].astype(cfg.dtype)
        S = cache["k"].shape[2]
        positions = jnp.broadcast_to(cache["pos"][None, None], (B, T)).astype(jnp.int32)
        kpos = jnp.arange(S)[None, :]
        mask = jnp.where(kpos <= positions[0][:, None], 0.0, -1e9)[None, None, :, :].astype(jnp.float32)

        def body(carry, per_layer):
            x = carry
            lp, ck, cv = per_layer
            B, T, H = x.shape
            h2 = llama.rms_norm(x, lp["input_layernorm"], eps).reshape(B * T, H)
            if gemm_only:
                # 7 chained projections, outputs folded back into x cheaply
                q = _qlinear(h2, "self_attn.q_proj", kinds["self_attn.q_proj"], lp["self_attn.q_proj"], cm, backend)
                k = _qlinear(h2, "self_attn.k_proj", kinds["self_attn.k_proj"], lp["self_attn.k_proj"], cm, backend)
                v = _qlinear(h2, "self_attn.v_proj", kinds["self_attn.v_proj"], lp["self_attn.v_proj"], cm, backend)
                ctx = q + jnp.tile(k, (1, rep)) + jnp.tile(v, (1, rep))
                o = _qlinear(ctx, "self_attn.o_proj", kinds["self_attn.o_proj"], lp["self_attn.o_proj"], cm, backend)
                x = x + o.reshape(B, T, H)
                h2 = llama.rms_norm(x, lp["post_attention_layernorm"], eps).reshape(B * T, H)
                g = _qlinear(h2, "mlp.gate_proj", kinds["mlp.gate_proj"], lp["mlp.gate_proj"], cm, backend)
                u = _qlinear(h2, "mlp.up_proj", kinds["mlp.up_proj"], lp["mlp.up_proj"], cm, backend)
                y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
                d = _qlinear(y, "mlp.down_proj", kinds["mlp.down_proj"], lp["mlp.down_proj"], cm, backend)
                x = x + d.reshape(B, T, H)
                return x, (ck, cv)

            q = _qlinear(h2, "self_attn.q_proj", kinds["self_attn.q_proj"], lp["self_attn.q_proj"], cm, backend)
            k = _qlinear(h2, "self_attn.k_proj", kinds["self_attn.k_proj"], lp["self_attn.k_proj"], cm, backend)
            v = _qlinear(h2, "self_attn.v_proj", kinds["self_attn.v_proj"], lp["self_attn.v_proj"], cm, backend)
            q = llama.rope(q.reshape(B, T, nH, hd), positions, cfg.rope_theta, cfg.rope_scaling)
            k = llama.rope(k.reshape(B, T, nKV, hd), positions, cfg.rope_theta, cfg.rope_scaling)
            v = v.reshape(B, T, nKV, hd)
            if no_attn:
                ctx = q.reshape(B * T, nH * hd)
            else:
                ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype), cache["pos"], axis=1)
                cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype), cache["pos"], axis=1)
                # grouped GQA: K/V stay at nKV heads through both einsums
                qg = q.reshape(B, T, nKV, rep, hd)
                scores = jnp.einsum("btgrd,bsgd->bgrts", qg, ck.astype(cfg.dtype),
                                    preferred_element_type=jnp.float32)
                scores = scores / math.sqrt(hd) + mask[:, 0][:, None, None]
                probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                ctx = jnp.einsum("bgrts,bsgd->btgrd", probs, cv.astype(cfg.dtype))
                ctx = ctx.reshape(B * T, nH * hd)
            o = _qlinear(ctx, "self_attn.o_proj", kinds["self_attn.o_proj"], lp["self_attn.o_proj"], cm, backend)
            x = x + o.reshape(B, T, H)
            h2 = llama.rms_norm(x, lp["post_attention_layernorm"], eps).reshape(B * T, H)
            g = _qlinear(h2, "mlp.gate_proj", kinds["mlp.gate_proj"], lp["mlp.gate_proj"], cm, backend)
            u = _qlinear(h2, "mlp.up_proj", kinds["mlp.up_proj"], lp["mlp.up_proj"], cm, backend)
            y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
            d = _qlinear(y, "mlp.down_proj", kinds["mlp.down_proj"], lp["mlp.down_proj"], cm, backend)
            x = x + d.reshape(B, T, H)
            return x, (ck, cv)

        x, (ck, cv) = jax.lax.scan(body, x, (params["layers"], cache["k"], cache["v"]))
        x = llama.rms_norm(x, params["norm"], eps)
        if no_head:
            nxt = jnp.argmax(x[:, -1, :128], axis=-1).astype(jnp.int32)[:, None]
        else:
            head_w = params.get("lm_head", params["embed_tokens"])
            logits = (x[:, -1, :] @ head_w.T.astype(x.dtype)).astype(jnp.float32)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        cache = {"k": ck, "v": cv, "pos": cache["pos"] + T}
        return nxt, cache

    import jax

    return jax.jit(step, donate_argnums=(3,))


def time_variant(runner, eng, cm, steps):
    """One timed pass: N chained decode steps from a fresh cache.

    Ends with a VALUE readback (np.asarray) of the final token:
    block_until_ready returns at dispatch time for donated buffers on this
    relay (BENCH_RESULTS.md round-2 timing notes), so a barrier-timed loop
    over donated steps measures dispatch, not compute."""
    import jax.numpy as jnp

    cache = eng.init_cache(BATCH, MAXLEN)
    cache["pos"] = jnp.asarray(PREFILL, jnp.int32)
    tok = jnp.zeros((BATCH, 1), jnp.int32)
    tok, cache = runner(cm.params, cm.qstate, tok, cache)  # warm/compile
    np.asarray(tok)  # drain the async chain before the timed block
    t0 = time.time()
    for _ in range(steps):
        tok, cache = runner(cm.params, cm.qstate, tok, cache)
    np.asarray(tok)  # value readback pays the real compute time
    return (time.time() - t0) / steps * 1e3  # ms/step


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp  # noqa

    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine

    results = {}
    for fmt in FORMATS:
        for L in LAYERS:
            import dataclasses

            cfg = dataclasses.replace(llama.LlamaConfig.llama3_8b(), num_hidden_layers=L)
            cm = build_cm(cfg, fmt)
            eng = serve_engine.Engine(
                cm,
                serve_engine.EngineConfig(
                    max_seq_len=MAXLEN, backend="pallas",
                    nvfp4_layout=os.environ.get("ABLATE_NVFP4_LAYOUT", "word"),
                    int4_layout=os.environ.get("ABLATE_INT4_LAYOUT", "word"),
                ),
            )
            # eng.cm, NOT cm: the engine's init converts packed layouts
            # (word/perm) — using the raw plane cm here once silently timed
            # the blockdot kernels for every 4-bit format (round-3 find)
            cm = eng.cm
            runners = {v: make_step(cfg, eng.ecfg, cm, eng.backend, v) for v in VARIANTS}
            # compile all first (round-robin timing must not include compiles)
            for v, r in runners.items():
                t0 = time.time()
                time_variant(r, eng, cm, 1)
                log(f"{fmt} L{L} {v}: compiled in {time.time()-t0:.1f}s")
            med = {v: [] for v in VARIANTS}
            for rep in range(REPEATS):
                for v in VARIANTS:
                    med[v].append(time_variant(runners[v], eng, cm, STEPS))
            drift = time_variant(runners[VARIANTS[0]], eng, cm, STEPS)
            for v in VARIANTS:
                ms = sorted(med[v])[len(med[v]) // 2]
                results[f"{fmt}_L{L}_{v}"] = round(ms, 3)
                log(f"{fmt} L{L} {v}: {ms:.3f} ms/step (all: {[round(x,3) for x in med[v]]})")
            results[f"{fmt}_L{L}_drift_recheck_{VARIANTS[0]}"] = round(drift, 3)
            log(f"{fmt} L{L} drift recheck {VARIANTS[0]}: {drift:.3f}")
            del cm, eng, runners
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
