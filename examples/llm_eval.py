#!/usr/bin/env python
"""Accuracy evaluation CLI — the `examples/llm_eval` analog.

Perplexity (and 5-shot MMLU when a local data dir is given) for a model,
optionally before/after quantization with a chosen preset.

  python examples/llm_eval.py --cpu --qformat NVFP4_DEFAULT_CFG
  python examples/llm_eval.py --model /ckpts/llama3-8b --mmlu_dir /data/mmlu
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--qformat", default=None)
    ap.add_argument("--calib_batches", type=int, default=4)
    ap.add_argument("--eval_batches", type=int, default=4)
    ap.add_argument("--seq_len", type=int, default=64)
    ap.add_argument("--mmlu_dir", default=None, help="local MMLU csv dir")
    ap.add_argument("--mmlu_subjects", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama
    from tensorrt_model_optimizer_tpu.utils import dataset, evaluate

    if args.model == "tiny":
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg, params = hf_loader.load_hf_checkpoint(args.model)
    batches = [jnp.asarray(b) for b in dataset.get_calib_batches(
        cfg.vocab_size, num_batches=args.calib_batches + args.eval_batches,
        seq_len=min(args.seq_len, cfg.max_position_embeddings))]
    calib, ev = batches[: args.calib_batches], batches[args.calib_batches:]

    t0 = time.time()
    ppl = evaluate.perplexity(cfg, params, ev)
    print(f"[llm_eval] bf16 ppl {ppl:.3f} ({time.time()-t0:.1f}s)", flush=True)

    layout = qstate = None
    if args.qformat:
        from tensorrt_model_optimizer_tpu.quant import ptq

        model = ptq.quantize(cfg, params, args.qformat, calib)
        params, layout, qstate = model.params, model.layout, model.qstate
        ppl_q = evaluate.perplexity(cfg, params, ev, layout=layout,
                                    qstate=qstate, adapters=model.adapters)
        print(f"[llm_eval] {args.qformat} ppl {ppl_q:.3f} "
              f"(delta {ppl_q - ppl:+.3f})", flush=True)

    if args.mmlu_dir:
        # needs a real tokenizer; tiny random models can't take MMLU
        from transformers import AutoTokenizer

        from tensorrt_model_optimizer_tpu.utils import mmlu

        tok = AutoTokenizer.from_pretrained(args.model)
        logits_fn = jax.jit(
            lambda t: llama.forward(cfg, params, t, layout=layout, qstate=qstate)[0]
        )
        ans_ids = tuple(tok.encode(f" {c}", add_special_tokens=False)[-1]
                        for c in "ABCD")
        res = mmlu.mmlu_eval(
            lambda t: logits_fn(jnp.asarray(t)),
            lambda s: tok.encode(s),
            ans_ids, args.mmlu_dir,
            subjects=mmlu.list_subjects(args.mmlu_dir)[: args.mmlu_subjects],
        )
        print(f"[llm_eval] MMLU 5-shot: {res['accuracy']:.2%} (n={res['n']})",
              flush=True)
    print("[llm_eval] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
