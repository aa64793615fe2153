#!/usr/bin/env python
"""Speculative-decoding acceptance benchmark (specdec_bench analog).

Reference: `examples/specdec_bench/` reports acceptance rate and mean
accepted tokens per verification step for each drafting method. This harness
trains each drafter briefly on the synthetic language against the trained
anchor model (or a random tiny model with SPECDEC_MODEL=tiny) and reports:

  accept_rate        accepted / proposed draft tokens
  tokens_per_step    mean tokens produced per base verification forward
                     (1.0 = no speculation benefit)

One JSON line per method on stdout; human-readable progress on stderr.

Env: SPECDEC_MODEL=anchor|tiny, SPECDEC_STEPS (decode length, default 64),
SPECDEC_TRAIN (drafter train steps, default 300), SPECDEC_METHODS.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("SPECDEC_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

MODEL = os.environ.get("SPECDEC_MODEL", "anchor")
STEPS = int(os.environ.get("SPECDEC_STEPS", "64"))
TRAIN = int(os.environ.get("SPECDEC_TRAIN", "300"))
METHODS = os.environ.get("SPECDEC_METHODS", "medusa,eagle,eagle3,dflash").split(",")


def log(m):
    print(f"[specdec] {m}", file=sys.stderr, flush=True)


def main_multiproc():
    """Run each method in its own subprocess (XLA-CPU accumulates compile
    arena across the four method suites — observed LLVM OOM/segfault when
    eagle3 compiled after medusa+eagle1 in one process)."""
    import subprocess

    for m in METHODS:
        env = {**os.environ, "SPECDEC_METHODS": m, "SPECDEC_SUBPROC": "1"}
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, text=True, capture_output=True)
        sys.stderr.write(r.stderr)
        sys.stdout.write(r.stdout)
        sys.stdout.flush()
        if r.returncode != 0:
            log(f"{m}: subprocess failed rc={r.returncode}")


def main():
    from tensorrt_model_optimizer_tpu.models import hf_loader, llama
    from tensorrt_model_optimizer_tpu.speculative import dflash, eagle, medusa
    from tensorrt_model_optimizer_tpu.utils import synthlang

    lang = synthlang.SynthLang(0)
    if MODEL == "anchor" and os.path.exists("artifacts/anchor-llama"):
        cfg, params = hf_loader.load_hf_checkpoint("artifacts/anchor-llama")
        cfg = llama.LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
        params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    else:
        cfg = synthlang.anchor_config()
        params = llama.init_params(cfg, jax.random.key(0))
        log("using random-init tiny model (anchor checkpoint not found)")
    stream = lang.token_stream(max(TRAIN, 64) * 8 * 65, seed=11)
    rng = np.random.default_rng(3)

    def batches(n, bs=8, seq=64):
        for _ in range(n):
            starts = rng.integers(0, stream.size - seq - 1, size=bs)
            yield jnp.asarray(np.stack([stream[s : s + seq + 1] for s in starts]))

    prompt = jnp.asarray(stream[:32][None].astype(np.int32))
    results = {}

    if "medusa" in METHODS:
        t0 = time.time()
        mcfg = medusa.MedusaConfig(num_heads=3, num_layers=1)
        heads = medusa.init_medusa(cfg, mcfg, jax.random.key(1))
        step = medusa.make_medusa_train_step(cfg, lr=1e-3)
        step = jax.jit(step)
        for toks in batches(TRAIN):
            heads, loss = step(heads, params, toks)
        toks, rate = medusa.propose_and_verify(cfg, params, heads, prompt, STEPS)
        produced = toks.shape[1] - prompt.shape[1]
        # verification forwards: one per loop iteration
        results["medusa"] = {"accept_rate": float(rate)}
        log(f"medusa: accept {rate:.3f} ({time.time()-t0:.0f}s)")

    if "eagle" in METHODS:
        t0 = time.time()
        ecfg = eagle.EagleConfig(num_layers=1)
        e1 = eagle.init_eagle(cfg, ecfg, jax.random.key(2))
        step = jax.jit(eagle.make_eagle_ttt_train_step(cfg, ttt_steps=3, lr=1e-3))
        for toks in batches(TRAIN):
            e1, loss, accs = step(e1, params, toks)
        _, rate = eagle.propose_and_verify(cfg, params, e1, prompt, STEPS)
        results["eagle"] = {"accept_rate": float(rate),
                            "ttt_train_acc": [round(float(a), 3) for a in accs]}
        log(f"eagle1: accept {rate:.3f} ttt_acc {accs} ({time.time()-t0:.0f}s)")

    if "eagle3" in METHODS:
        t0 = time.time()
        ecfg = eagle.EagleConfig(num_layers=1)
        e3 = eagle.init_eagle3(cfg, ecfg, jax.random.key(4))
        step = jax.jit(eagle.make_eagle3_ttt_train_step(cfg, ttt_steps=3, lr=1e-3))
        for toks in batches(TRAIN):
            e3, loss, accs = step(e3, params, toks)
        _, rate = eagle.propose_and_verify(cfg, params, e3, prompt, STEPS)
        results["eagle3"] = {"accept_rate": float(rate),
                             "aux_layers": list(e3["aux_layer_ids"]),
                             "ttt_train_acc": [round(float(a), 3) for a in accs]}
        log(f"eagle3: accept {rate:.3f} ttt_acc {accs} ({time.time()-t0:.0f}s)")

    if "dflash" in METHODS:
        t0 = time.time()
        dcfg = dflash.DFlashConfig(block_size=4)
        dp = dflash.init_dflash(cfg, dcfg, jax.random.key(3))
        step = jax.jit(dflash.make_dflash_train_step(cfg, dcfg, lr=1e-3))
        for toks in batches(TRAIN):
            dp, loss = step(dp, params, toks)
        _, rate = dflash.propose_and_verify(cfg, params, dp, prompt, STEPS)
        results["dflash"] = {"accept_rate": float(rate)}
        log(f"dflash: accept {rate:.3f} ({time.time()-t0:.0f}s)")

    for m, r in results.items():
        # tokens/step: every loop produces 1 bonus + accepted draft tokens
        k = {"medusa": 3, "eagle": 3, "eagle3": 3, "dflash": 4}[m]
        r["tokens_per_step"] = round(1 + r["accept_rate"] * k, 3)
        print(json.dumps({"method": m, **r}, default=lambda o: float(o)))


if __name__ == "__main__":
    if len(METHODS) > 1 and os.environ.get("SPECDEC_SUBPROC") != "1":
        main_multiproc()
    else:
        main()
