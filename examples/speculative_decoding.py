#!/usr/bin/env python
"""Speculative decoding demo — the `examples/speculative_decoding` equivalent.

Trains a draft (medusa heads, EAGLE TTT, or DFlash block) on a tiny model
and measures acceptance with the matching verifier — including tree
verification for medusa (one forward verifies the whole candidate tree).

  python examples/speculative_decoding.py --mode medusa --tree
  python examples/speculative_decoding.py --mode eagle
  python examples/speculative_decoding.py --mode dflash
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["medusa", "eagle", "dflash"], default="medusa")
    ap.add_argument("--tree", action="store_true", help="tree verification (medusa)")
    ap.add_argument("--engine", action="store_true",
                    help="run tree verification inside the serving engine")
    ap.add_argument("--train_steps", type=int, default=30)
    ap.add_argument("--decode_steps", type=int, default=16)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.models import llama

    cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)))
    prompt = data[:1, :8]
    t0 = time.time()

    if args.mode == "medusa":
        from tensorrt_model_optimizer_tpu.speculative import medusa as M

        mcfg = M.MedusaConfig(num_heads=3)
        draft = M.init_medusa(cfg, mcfg, jax.random.PRNGKey(1))
        step = jax.jit(M.make_medusa_train_step(cfg))
        for _ in range(args.train_steps):
            draft, loss = step(draft, params, data)
        print(f"[specdec] medusa trained {args.train_steps} steps "
              f"(loss {float(loss):.3f}) in {time.time()-t0:.1f}s", flush=True)
        if args.engine:
            from tensorrt_model_optimizer_tpu.quant import compress, ptq
            from tensorrt_model_optimizer_tpu.serve import engine as se

            model = ptq.quantize(cfg, params, "FP8_DEFAULT_CFG", [data])
            cm = compress.compress(model)
            eng = se.Engine(cm, se.EngineConfig(max_seq_len=64, backend="xla"))
            out, rate = eng.generate_speculative(prompt, draft,
                                                 max_new_tokens=args.decode_steps)
            print(f"[specdec] ENGINE tree-spec: {len(out)} tokens, "
                  f"acceptance {rate:.2%}", flush=True)
        elif args.tree:
            from tensorrt_model_optimizer_tpu.speculative import tree as T

            out, rate = T.tree_propose_and_verify(
                cfg, params, draft, prompt, steps=args.decode_steps)
            print(f"[specdec] TREE verify: {out.shape[1]-prompt.shape[1]} tokens, "
                  f"acceptance {rate:.2%}", flush=True)
        else:
            out, rate = M.propose_and_verify(cfg, params, draft, prompt,
                                             steps=args.decode_steps)
            print(f"[specdec] chain verify: acceptance {rate:.2%}", flush=True)
    elif args.mode == "eagle":
        from tensorrt_model_optimizer_tpu.speculative import eagle as E

        draft = E.init_eagle(cfg, E.EagleConfig(), jax.random.PRNGKey(1))
        step = jax.jit(E.make_eagle_ttt_train_step(cfg, ttt_steps=2))
        for _ in range(args.train_steps):
            draft, loss, accs = step(draft, params, data)
        print(f"[specdec] eagle TTT trained: loss {float(loss):.3f}, "
              f"per-step acc {[f'{float(a):.2%}' for a in accs]}", flush=True)
    else:
        from tensorrt_model_optimizer_tpu.speculative import dflash as DF

        dcfg = DF.DFlashConfig(block_size=3)
        draft = DF.init_dflash(cfg, dcfg, jax.random.PRNGKey(1))
        step = jax.jit(DF.make_dflash_train_step(cfg, dcfg))
        for _ in range(args.train_steps):
            draft, loss = step(draft, params, data)
        out, rate = DF.propose_and_verify(cfg, params, draft, prompt,
                                          steps=args.decode_steps)
        print(f"[specdec] dflash: loss {float(loss):.3f}, "
              f"acceptance {rate:.2%}", flush=True)
    print("[specdec] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
