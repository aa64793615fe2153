#!/usr/bin/env python
"""Train a routed-MoE synthetic-language anchor (trained MoE checkpoint).

Produces `artifacts/anchor-moe/` (qwen3_moe-style config.json +
model.safetensors) + metrics.json, so the MoE quantization algorithms
(family AWQ/SmoothQuant/GPTQ, per-expert formats, MoE serving) can be
measured on a genuinely TRAINED mixture — extending the round-2 accuracy
anchor (ACCURACY.md) beyond the dense llama.

Env: MOE_STEPS (3000), MOE_BATCH (16), MOE_SEQ (128), MOE_LR (1e-3),
MOE_OUT (artifacts/anchor-moe). Runs on the CPU backend by default (the
model is ~7M params; the TPU relay is not required).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("MOE_TPU", "0") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

STEPS = int(os.environ.get("MOE_STEPS", "3000"))
BATCH = int(os.environ.get("MOE_BATCH", "16"))
SEQ = int(os.environ.get("MOE_SEQ", "128"))
LR = float(os.environ.get("MOE_LR", "1e-3"))
OUT = os.environ.get("MOE_OUT", "artifacts/anchor-moe")


def anchor_moe_config(dtype=None):
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models.mixtral import MixtralConfig
    from tensorrt_model_optimizer_tpu.utils.synthlang import VOCAB_SIZE

    return MixtralConfig(
        vocab_size=VOCAB_SIZE, hidden_size=256, intermediate_size=256,
        num_hidden_layers=6, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, qk_norm=True,  # qwen3_moe flavor
        num_experts=4, top_k=2, capacity_factor=2.0,
        dtype=dtype or jnp.float32,
    )


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tensorrt_model_optimizer_tpu.models import hf_loader, mixtral
    from tensorrt_model_optimizer_tpu.quant.qat import cross_entropy
    from tensorrt_model_optimizer_tpu.utils import synthlang
    from tensorrt_model_optimizer_tpu.utils.evaluate import perplexity

    lang = synthlang.SynthLang(0)
    cfg = anchor_moe_config()
    params = mixtral.init_params(cfg, jax.random.key(0))

    n_tokens = STEPS * BATCH * (SEQ // 4) + BATCH * SEQ
    print(f"[moe-anchor] corpus ~{n_tokens/1e6:.1f}M tokens", flush=True)
    stream = lang.token_stream(n_tokens, seed=1)

    warmup = min(150, STEPS // 2)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, LR, warmup, max(STEPS, warmup + 1), LR * 0.02)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, tokens):
        def loss_fn(p):
            logits, _ = mixtral.forward(cfg, p, tokens[:, :-1])
            return cross_entropy(logits, tokens[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(2)
    t0 = time.time()
    for step in range(STEPS):
        starts = rng.integers(0, stream.size - SEQ - 1, size=BATCH)
        tokens = jnp.asarray(np.stack([stream[s: s + SEQ + 1] for s in starts]))
        params, opt_state, loss = train_step(params, opt_state, tokens)
        if step % 200 == 0 or step == STEPS - 1:
            print(f"[moe-anchor] step {step} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(OUT, exist_ok=True)
    hf_loader.save_hf_checkpoint(cfg, params, OUT)

    ev = list(lang.eval_batches(4, 8, SEQ, seed=999))
    ppl = perplexity(cfg, params, ev, forward_fn=mixtral.forward)
    print(f"[moe-anchor] held-out ppl: {ppl:.4f}", flush=True)
    cfg2, params2 = hf_loader.load_hf_moe_checkpoint(OUT, dtype=jnp.float32)
    ppl2 = perplexity(cfg2, params2, ev, forward_fn=mixtral.forward)
    if not (abs(ppl2 - ppl) < 0.05 * ppl + 0.05):
        raise RuntimeError(f"reload ppl {ppl2} != in-process ppl {ppl}")
    print(f"[moe-anchor] save verified (reload ppl {ppl2:.4f})", flush=True)
    with open(os.path.join(OUT, "metrics.json"), "w") as f:
        json.dump({"final_loss": float(loss), "ppl": ppl, "steps": STEPS,
                   "batch": BATCH, "seq": SEQ}, f, indent=1)
    print(f"[moe-anchor] saved to {OUT}", flush=True)


if __name__ == "__main__":
    main()
