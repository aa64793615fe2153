#!/usr/bin/env python
"""End-to-end PTQ CLI — the `examples/hf_ptq/hf_ptq.py` equivalent.

Load an HF Llama checkpoint (or a random tiny model), quantize with a chosen
preset + calibration data, report perplexity before/after, and export a
unified quantized HF checkpoint.

Examples:
  python examples/hf_ptq.py --model tiny --qformat NVFP4_DEFAULT_CFG \
      --export_path /tmp/tiny_nvfp4
  python examples/hf_ptq.py --model /path/to/llama3-8b \
      --qformat INT4_AWQ_CFG --calib_data tokens.npy \
      --export_path /tmp/llama3_int4awq
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", help="'tiny' or an HF checkpoint dir")
    ap.add_argument("--qformat", default="FP8_DEFAULT_CFG")
    ap.add_argument("--recipe", default=None,
                    help="YAML recipe (builtin name or path); overrides --qformat")
    ap.add_argument("--override", action="append", default=[],
                    help="dotlist recipe overrides, e.g. calib.num_batches=2")
    ap.add_argument("--calib_data", default=None, help="tokens .npy/.bin or text file")
    ap.add_argument("--tokenizer", default=None, help="tokenizer dir for text data")
    ap.add_argument("--calib_batches", type=int, default=8)
    ap.add_argument("--calib_seq_len", type=int, default=512)
    ap.add_argument("--batch_size", default="2",
                    help="calibration batch size, or 'auto' to OOM-probe the "
                         "largest that fits (reference dataset_utils.py:996)")
    ap.add_argument("--export_path", default=None)
    ap.add_argument("--save_state", default=None, help="dir for mto-style save")
    ap.add_argument("--eval_ppl", action="store_true", default=True)
    ap.add_argument("--auto_quantize_bits", type=float, default=None,
                    help="enable AutoQuantize with this effective-bits budget")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama
    from tensorrt_model_optimizer_tpu.quant import ptq
    from tensorrt_model_optimizer_tpu.utils import dataset, evaluate

    qformat = args.qformat
    if args.recipe:
        from tensorrt_model_optimizer_tpu.recipes import loader as recipe_loader

        recipe = recipe_loader.load_recipe(args.recipe, args.override)
        qformat = recipe.resolve_quant_config()
        args.calib_batches = recipe.calib.num_batches
        args.batch_size = recipe.calib.batch_size
        args.calib_seq_len = recipe.calib.seq_len
        args.export_path = args.export_path or recipe.export_path
        args.save_state = args.save_state or recipe.save_state
        print(f"[hf_ptq] recipe {args.recipe} -> preset {recipe.quant.preset}", flush=True)

    t0 = time.time()
    family = None  # None = llama family (full algorithm support)
    if args.model == "tiny":
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=4)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    else:
        import json as _json

        from tensorrt_model_optimizer_tpu.models import registry

        with open(os.path.join(args.model, "config.json")) as f:
            mt = _json.load(f).get("model_type", "llama")
        fam = registry.for_hf_model_type(mt)
        if fam.name == "llama":
            cfg, params = hf_loader.load_hf_checkpoint(args.model)
        else:
            cfg, params = hf_loader.load_hf_moe_checkpoint(args.model)
            family = fam
    print(f"[hf_ptq] model loaded in {time.time()-t0:.1f}s: "
          f"{cfg.num_hidden_layers}L x {cfg.hidden_size}h"
          + (f" ({family.name})" if family else ""), flush=True)

    if str(args.batch_size) == "auto":
        # OOM-probe the largest calibration batch that fits on the device
        # (reference get_max_batch_size, dataset_utils.py:996): execute the
        # real forward at doubling batch sizes — the axon relay reports
        # all-zero memory_stats, so probing by execution is the only
        # reliable signal.
        import numpy as _np

        from tensorrt_model_optimizer_tpu.utils import memory

        seq = min(args.calib_seq_len, cfg.max_position_embeddings)
        fwd_fn = family.forward if family else llama.forward

        def _try(b):
            toks = jnp.ones((b, seq), jnp.int32)
            out = jax.jit(lambda p, t: fwd_fn(cfg, p, t)[0])(params, toks)
            _np.asarray(out[0, -1, :8])  # value readback = real execution

        args.batch_size = memory.find_max_batch_size(_try, start=2, ceiling=64)
        print(f"[hf_ptq] auto batch_size -> {args.batch_size} "
              f"(OOM-probed at seq {seq})", flush=True)
    else:
        args.batch_size = int(args.batch_size)

    batches = [
        jnp.asarray(b)
        for b in dataset.get_calib_batches(
            cfg.vocab_size, args.calib_data, args.tokenizer,
            args.calib_batches, args.batch_size,
            min(args.calib_seq_len, cfg.max_position_embeddings),
        )
    ]

    ppl_before = None
    if args.eval_ppl:
        ppl_before = evaluate.perplexity(
            cfg, params, batches[:4],
            forward_fn=family.forward if family else None,
        )
        print(f"[hf_ptq] bf16 ppl {ppl_before:.3f}", flush=True)

    t0 = time.time()
    if args.auto_quantize_bits:
        from tensorrt_model_optimizer_tpu.quant import auto

        if family is not None:
            res = auto.auto_quantize_moe(
                cfg, params, [qformat, "FP8_DEFAULT_CFG"], batches,
                effective_bits=args.auto_quantize_bits,
                forward_fn=family.forward,
            )
            print(f"[hf_ptq] auto_quantize_moe achieved "
                  f"{res.effective_bits:.2f} effective bits in "
                  f"{time.time()-t0:.1f}s", flush=True)
            return 0
        res = auto.auto_quantize(
            cfg, params, [qformat, "FP8_DEFAULT_CFG"], batches,
            effective_bits=args.auto_quantize_bits,
        )
        print(f"[hf_ptq] auto_quantize achieved {res.effective_bits:.2f} "
              f"effective bits in {time.time()-t0:.1f}s", flush=True)
        logits, _ = llama.forward_unrolled(cfg, params, batches[0], res.layer_layouts, res.qstate_list)
        print("[hf_ptq] mixed-precision forward OK", flush=True)
        return 0

    if family is None:
        model = ptq.quantize(cfg, params, qformat, batches)
    else:
        model = ptq.quantize_family(family, cfg, params, qformat, batches)
    label = args.recipe or args.qformat
    print(f"[hf_ptq] quantized ({label}) in {time.time()-t0:.1f}s", flush=True)

    if args.eval_ppl:
        ppl_after = evaluate.perplexity(
            cfg, model.params, batches[:4], layout=model.layout,
            qstate=model.qstate, adapters=model.adapters,
            forward_fn=model.forward_fn,
        )
        print(f"[hf_ptq] quantized ppl {ppl_after:.3f} "
              f"(delta {ppl_after - ppl_before:+.3f})", flush=True)

    if args.save_state:
        from tensorrt_model_optimizer_tpu.opt import state as opt_state

        opt_state.save(model, args.save_state)
        print(f"[hf_ptq] modelopt state saved to {args.save_state}", flush=True)

    if args.export_path:
        from tensorrt_model_optimizer_tpu.export import hf_export

        try:
            qc = hf_export.export_hf_checkpoint(model, args.export_path)
        except NotImplementedError as e:
            print(f"[hf_ptq] unified export unavailable for this family "
                  f"({e}); state was saved via --save_state if given", flush=True)
            return 0
        print(f"[hf_ptq] exported {qc['quantization']['quant_algo']} "
              f"checkpoint to {args.export_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
