#!/usr/bin/env python
"""Prune-then-distill example — the Minitron flow (`examples/pruning` +
`examples/llm_distill` analog): importance scoring, width/depth prune,
knowledge-distillation healing from the unpruned teacher."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--ffn_ratio", type=float, default=0.5)
    ap.add_argument("--hidden_ratio", type=float, default=0.75)
    ap.add_argument("--distill_steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.distill import distillation
    from tensorrt_model_optimizer_tpu.models import hf_loader, llama
    from tensorrt_model_optimizer_tpu.prune import minitron
    from tensorrt_model_optimizer_tpu.utils import dataset, evaluate

    if args.model == "tiny":
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg, params = hf_loader.load_hf_checkpoint(args.model)
    batches = [jnp.asarray(b) for b in dataset.get_calib_batches(
        cfg.vocab_size, num_batches=4, seq_len=64)]

    scores = minitron.importance(cfg, params, batches)
    new_I = int(cfg.intermediate_size * args.ffn_ratio)
    new_H = int(cfg.hidden_size * args.hidden_ratio) // cfg.hd * cfg.hd or cfg.hd
    new_cfg, new_params, plan = minitron.prune(
        cfg, params, scores, intermediate_size=new_I, hidden_size=new_H
    )
    print(f"[prune_distill] pruned to I={new_I} H={new_H}", flush=True)
    ppl_t = evaluate.perplexity(cfg, params, batches[:2])
    ppl_p = evaluate.perplexity(new_cfg, new_params, batches[:2])
    print(f"[prune_distill] teacher ppl {ppl_t:.3f}, pruned ppl {ppl_p:.3f}", flush=True)

    step = jax.jit(distillation.make_distill_step(new_cfg, lr=5e-3, teacher_cfg=cfg))
    student = new_params
    for i in range(args.distill_steps):
        student, loss = step(student, params, batches[i % len(batches)])
        if i % 5 == 0:
            print(f"[prune_distill] distill step {i} loss {float(loss):.4f}", flush=True)
    ppl_d = evaluate.perplexity(new_cfg, student, batches[:2])
    print(f"[prune_distill] healed ppl {ppl_d:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
