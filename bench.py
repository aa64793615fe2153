#!/usr/bin/env python
"""Decode-throughput benchmark: quantized Llama-3.1-8B serving on one chip.

Measures greedy decode tokens/s of the real-quant engine (packed weights +
fused Pallas dequant-matmul kernels, on-device decode loop). Weights are
synthesized directly in packed form — throughput is independent of weight
values, and this avoids materializing 16 GB of bf16 on one chip.

Baseline: the reference's Llama3.1-8B INT4-AWQ decode throughput at BS8 on
H200 (TRT-LLM v0.15) = 599.7 tok/s (`examples/benchmark.md:23-25`,
BASELINE.md). vs_baseline = ours / 599.7.

Prints exactly ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

FORMAT = os.environ.get("BENCH_FORMAT", "int4")
BATCH = int(os.environ.get("BENCH_BS", "8"))
PREFILL = int(os.environ.get("BENCH_PREFILL", "128"))
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
MAXLEN = int(os.environ.get("BENCH_MAXLEN", "512"))

# Reference numbers (H200 TP1, examples/benchmark.md:23-25), keyed by the
# closest comparable format at BS8.
BASELINES_BS8 = {"int4": 599.7, "nvfp4": 599.7, "fp8": 1051.2, "int8": 1051.2, "w8a8": 1051.2, "bf16": 803.1}


def synth_packed_layers(cfg, fmt, rng):
    """Packed projection weights, directly in serving layout."""
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import llama

    L = cfg.num_hidden_layers
    shapes = llama._layer_shapes(cfg)
    layers = {
        "input_layernorm": jnp.ones((L, cfg.hidden_size), cfg.dtype),
        "post_attention_layernorm": jnp.ones((L, cfg.hidden_size), cfg.dtype),
    }
    kinds = {}
    for name in llama.PROJ_NAMES:
        O, K = shapes[name]
        if fmt == "int4":
            bsz = 128
            layers[name] = {
                "packed": jnp.asarray(rng.integers(0, 256, size=(L, O // 2, K), dtype=np.uint8)),
                "scale_lo": jnp.full((L, O // 2, K // bsz), 0.01, jnp.float32),
                "scale_hi": jnp.full((L, O // 2, K // bsz), 0.01, jnp.float32),
            }
            kinds[name] = "int4"
        elif fmt == "nvfp4":
            bsz = 16
            layers[name] = {
                "packed": jnp.asarray(rng.integers(0, 256, size=(L, O // 2, K), dtype=np.uint8)),
                "scale_lo": jnp.full((L, O // 2, K // bsz), 1.0, jnp.float8_e4m3fn),
                "scale_hi": jnp.full((L, O // 2, K // bsz), 1.0, jnp.float8_e4m3fn),
                "global_scale": jnp.full((L,), 0.01, jnp.float32),
            }
            kinds[name] = "nvfp4"
        elif fmt in ("int8", "w8a8"):
            q = rng.integers(-127, 127, size=(L, O, K), dtype=np.int8)
            layers[name] = {
                "q": jnp.asarray(q),
                "scale": jnp.full((L, O, 1), 0.001, jnp.float32),
            }
            kinds[name] = "int8"
        elif fmt == "fp8":
            # valid-e4m3 bit patterns directly (bits 0..126 = finite positives)
            import ml_dtypes

            bits = rng.integers(0, 127, size=(L, O, K), dtype=np.uint8)
            layers[name] = {
                "q": jnp.asarray(bits.view(ml_dtypes.float8_e4m3fn)),
                "scale": jnp.full((L, O, 1), 0.01, jnp.float32),
            }
            kinds[name] = fmt
        else:  # bf16 — synthesize small-magnitude bit patterns (fast path;
            # sampling 8B normals in numpy takes many minutes)
            import ml_dtypes

            bits = rng.integers(0, 0x3C00, size=(L, O, K), dtype=np.uint16)
            layers[name] = {"w": jnp.asarray(bits.view(ml_dtypes.bfloat16))}
            kinds[name] = "bf16"
    return layers, kinds


def cm_bytes(cm):
    import jax

    return sum(
        a.size * a.dtype.itemsize
        for a in jax.tree.leaves(cm.params["layers"])
    )


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.quant import get_preset
    from tensorrt_model_optimizer_tpu.quant.compress import CompressedModel
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine

    cfg = llama.LlamaConfig.llama3_8b()
    rng = np.random.default_rng(0)
    layers, kinds = synth_packed_layers(cfg, FORMAT, rng)
    h = cfg.hidden_size
    params = {
        "embed_tokens": jnp.asarray(
            rng.normal(scale=0.01, size=(cfg.vocab_size, h)).astype(np.float32), cfg.dtype
        ),
        "layers": layers,
        "norm": jnp.ones((h,), cfg.dtype),
    }
    params["lm_head"] = params["embed_tokens"]

    preset = {"int4": "INT4_AWQ_CFG", "nvfp4": "NVFP4_WEIGHT_ONLY_CFG",
              "fp8": "FP8_DEFAULT_CFG", "int8": "INT8_DEFAULT_CFG",
              "w8a8": "INT8_DEFAULT_CFG", "bf16": "INT4_AWQ_CFG"}[FORMAT]
    if FORMAT == "w8a8":
        # act quantizers ON: drives the native int8-MXU W8A8 path
        from tensorrt_model_optimizer_tpu.quant.quantizer import QuantizerState

        layout = llama.build_layout(cfg, get_preset(preset))
        qstate = {
            name: {"input": QuantizerState(
                amax=jnp.full((cfg.num_hidden_layers,), 3.0, jnp.float32))}
            for name in llama.PROJ_NAMES
        }
        cm = CompressedModel(cfg, params, kinds, layout, qstate)
    else:
        # weight-only serving: act quantizers off for the throughput benchmark
        cm = CompressedModel(cfg, params, kinds, llama.QuantLayout(sites=()), {})

    eng = serve_engine.Engine(cm, serve_engine.EngineConfig(max_seq_len=MAXLEN, backend="pallas"))
    log(f"packed model built: format={FORMAT} bytes={cm_bytes(cm)/1e9:.2f} GB")

    # Decode-only throughput: start from a cache pre-positioned at PREFILL
    # (contents irrelevant for throughput). Compile ONE decode step (the
    # layer scan); loop steps at host level — the remote compiler chokes on
    # scan-of-scan, and per-dispatch overhead (~100 us) is part of honest
    # serving latency anyway.
    from functools import partial

    from tensorrt_model_optimizer_tpu.serve.engine import _model_step

    cache = eng.init_cache(BATCH, MAXLEN)
    cache["pos"] = jnp.asarray(PREFILL, jnp.int32)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(BATCH, 1), dtype=np.int32))
    step = jax.jit(partial(_model_step, cfg, eng.ecfg, cm, eng.backend))

    def one(tok, cache):
        B = tok.shape[0]
        positions = jnp.broadcast_to(cache["pos"][None, None], (B, 1)).astype(jnp.int32)
        logits, cache = step(cm.params, cm.qstate, tok, cache, positions)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

    t0 = time.time()
    tok2, cache = one(tok, cache)
    jax.block_until_ready(tok2)
    prefill_compile_s = time.time() - t0
    log(f"decode-step compile+first: {prefill_compile_s:.1f}s")

    tok = tok2
    t0 = time.time()
    for _ in range(STEPS):
        tok, cache = one(tok, cache)
    jax.block_until_ready(tok)
    dt = time.time() - t0
    log(f"decode: {dt*1e3:.1f} ms for {STEPS} steps")

    # TTFT: prefill latency for the PREFILL-token prompt (baseline scenario
    # uses 2048-in; set BENCH_PREFILL=2048 for the full number)
    ttft_ms = None
    if os.environ.get("BENCH_TTFT", "1") == "1":
        prompt = jnp.asarray(
            rng.integers(0, cfg.vocab_size, size=(BATCH, PREFILL), dtype=np.int32)
        )
        pc = eng.init_cache(BATCH, MAXLEN)
        logits, _ = eng.prefill(prompt, pc)
        jax.block_until_ready(logits)  # compile
        t0 = time.time()
        logits, _ = eng.prefill(prompt, pc)
        jax.block_until_ready(logits)
        ttft_ms = (time.time() - t0) * 1e3
        log(f"prefill({PREFILL}) TTFT: {ttft_ms:.1f} ms")

    tok_s = BATCH * STEPS / dt
    baseline = BASELINES_BS8.get(FORMAT, 599.7)
    print(json.dumps({
        "metric": f"llama3.1-8b-{FORMAT}-decode-tok/s/chip-bs{BATCH}",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / baseline, 3),
        "step_ms": round(dt / STEPS * 1e3, 2),
        "compile_s": round(prefill_compile_s, 1),
        "format": FORMAT, "bs": BATCH, "prefill": PREFILL, "steps": STEPS,
        "hw": jax.devices()[0].device_kind,
        **({"ttft_ms": round(ttft_ms, 1)} if ttft_ms is not None else {}),
        "baseline": f"H200 TRT-LLM {FORMAT} BS8 ({baseline} tok/s)",
    }))


if __name__ == "__main__":
    sys.exit(main())
