#!/usr/bin/env python
"""DeepSeek-style PTQ with EP+TP-sharded calibration (BASELINE config[4];
reference `examples/deepseek/deepseek_v3/ptq.py` — multi-GPU MLA + MoE PTQ).

The MLA projections shard over the `tensor` mesh axis and the routed experts
over the `expert` axis (`deepseek.param_specs`); the identical traced
calibration step runs under GSPMD, which inserts every amax reduction the
sharding implies (the reference wires these by hand per parallel group,
`model_calib.py:390-498`). The script checks the sharded amax equals the
single-device amax, then runs fake-quant inference and reports logit
correlation vs bf16.

CPU smoke: python examples/deepseek_ptq_sharded.py --cpu --devices 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qformat", default="NVFP4_DEFAULT_CFG")
    ap.add_argument("--devices", type=int, default=8)
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
    from jax.sharding import PartitionSpec as P

    from tensorrt_model_optimizer_tpu.models import deepseek

    n_dev = len(jax.devices())
    cfg = deepseek.DeepseekConfig.tiny()
    params = deepseek.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 32)))
        for _ in range(4)
    ]

    # single-device reference
    qm_ref = deepseek.quantize(cfg, params, args.qformat, batches)

    devs = np.array(jax.devices()).reshape(n_dev // 4, 2, 2)
    mesh = Mesh(devs, ("data", "expert", "tensor"))
    specs = deepseek.param_specs(cfg)
    with mesh:
        params_s = jax.tree.map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            params, specs,
        )
        batches_s = [
            jax.device_put(b, NamedSharding(mesh, P("data", None)))
            for b in batches
        ]
        qm = deepseek.quantize(cfg, params_s, args.qformat, batches_s)

    flat_r = jax.tree_util.tree_flatten_with_path(qm_ref.qstate)[0]
    flat_s = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(qm.qstate)[0]
    }
    worst = 0.0
    for k, v in flat_r:
        d = float(np.max(np.abs(np.asarray(v) - np.asarray(flat_s[jax.tree_util.keystr(k)]))))
        worst = max(worst, d)
    print(f"[deepseek_ptq] sharded-vs-single amax max|diff| = {worst:.2e}")
    assert worst < 1e-4, worst

    ref, _, _ = deepseek.forward(cfg, params, batches[0])
    got, _, _ = qm.forward(batches[0])
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    print(f"[deepseek_ptq] {args.qformat}: quantized logit corr vs bf16 = {corr:.4f}")


if __name__ == "__main__":
    main()
