#!/usr/bin/env python
"""QAT example — the `examples/llm_qat/train.py` analog.

Quantize-then-finetune: PTQ calibrate, then train with fake quant active
(STE). `--qad` distills from the bf16 teacher while training (QADTrainer
analog); `--lsq` makes amax learnable.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--qformat", default="NVFP4_DEFAULT_CFG")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--qad", action="store_true", help="distill from bf16 teacher")
    ap.add_argument("--lsq", action="store_true", help="learn amax (LSQ)")
    ap.add_argument("--save_state", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama
    from tensorrt_model_optimizer_tpu.quant import get_preset, qat
    from tensorrt_model_optimizer_tpu.utils import dataset

    if args.model == "tiny":
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg, params = hf_loader.load_hf_checkpoint(args.model)

    batches = [jnp.asarray(b) for b in dataset.get_calib_batches(
        cfg.vocab_size, num_batches=4, seq_len=64)]

    qcfg = get_preset(args.qformat)
    if args.lsq:
        from tensorrt_model_optimizer_tpu.quant.config import QuantizeConfig

        qcfg = QuantizeConfig(
            rules=tuple(
                (p, c.replace(learn_amax=True) if (c.enable and not c.is_fp and not c.dynamic) else c)
                for p, c in qcfg.rules
            ),
            algorithm=qcfg.algorithm,
        )
    layout = llama.build_layout(cfg, qcfg)
    qs = llama.init_quant_state(cfg, layout)
    for b in batches:
        _, qs, _ = llama.forward(cfg, params, b, layout=layout, qstate=qs, calib=True)
    print("[llm_qat] calibrated", flush=True)

    if args.qad:
        from tensorrt_model_optimizer_tpu.distill import distillation

        step = jax.jit(distillation.make_distill_step(cfg, lr=args.lr, layout=layout))
        teacher = params
        for i in range(args.steps):
            params, loss = step(params, teacher, batches[i % len(batches)], qs)
            if i % 5 == 0:
                print(f"[llm_qat] QAD step {i} loss {float(loss):.4f}", flush=True)
    else:
        step_fn, init_fn = qat.make_optax_train_step(
            cfg, layout, optax.adam(args.lr), train_amax=args.lsq
        )
        opt_state = init_fn(params, qs)
        jstep = jax.jit(step_fn)
        for i in range(args.steps):
            params, qs, opt_state, loss = jstep(params, qs, opt_state, batches[i % len(batches)])
            if i % 5 == 0:
                print(f"[llm_qat] step {i} loss {float(loss):.4f}", flush=True)

    if args.save_state:
        from tensorrt_model_optimizer_tpu.opt import state as opt_state_mod
        from tensorrt_model_optimizer_tpu.quant.ptq import QuantizedModel

        opt_state_mod.save(
            QuantizedModel(cfg, params, layout, qs, qcfg), args.save_state
        )
        print(f"[llm_qat] saved to {args.save_state}", flush=True)
    print("[llm_qat] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
