#!/bin/bash
# Round-3 on-chip chain 2: anchor training (liveness-gated) then the
# kernel probe re-run (fast-window-gated: the 00:04Z probe ran in a window
# where bf16 gate-proj measured 56.8 GB/s vs the healthy 723 — every
# variant sat on a ~2 ms floor and the comparison was noise).
cd /root/repo
A=artifacts/bench_r03
mkdir -p $A
log() { date -u +"%FT%TZ $*" >> $A/chain.log; }
log "chain2b start (final corpus: long-range context docs)"

# liveness gate (relay answers small work in bounded time)
until timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((512,512), jnp.bfloat16)
np.asarray((x@x)[0,0])" 2>/dev/null; do
  log "liveness fail; sleeping 120"; sleep 120
done
log "liveness ok"

log "train llama anchor start"
ANCHOR_SEQ=448 ANCHOR_STEPS=20000 timeout 4000 python -u tools/train_anchor.py \
  > $A/train_llama.log 2>&1
log "train llama anchor done rc=$?"

log "train moe anchor start"
MOE_STEPS=1500 MOE_TPU=1 timeout 2400 python -u tools/train_moe_anchor.py \
  > $A/train_moe.log 2>&1
log "train moe anchor done rc=$?"

# fast-window gate for kernel timing: bf16 gate-proj chain must beat
# 300 GB/s (healthy window: 723)
while :; do
  gbs=$(timeout 600 python - <<'EOF' 2>/dev/null
import time, numpy as np, jax, jax.numpy as jnp
O, K, B, IT = 14336, 4096, 8, 16
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
W = jnp.asarray(rng.normal(size=(O, K)) * 0.02, jnp.bfloat16)
def run(x, w):
    def body(i, x):
        y = x @ w.T
        return x + (y[:, :1] * 1e-6).astype(x.dtype)
    return jax.lax.fori_loop(0, IT, body, x)
f = jax.jit(run)
np.asarray(f(x0, W))
t0 = time.time(); np.asarray(f(x0, W)); dt = (time.time() - t0) / IT
print(round(O * K * 2 / dt / 1e9))
EOF
)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$gbs" ] && [ "$gbs" -gt 300 ]; then
    log "fast-window ok (bf16 ${gbs} GB/s)"; break
  fi
  log "window slow (bf16 ${gbs:-fail} GB/s); sleeping 180"; sleep 180
done

log "probe_qmm_opt (fast window) start"
timeout 2400 python -u tools/probe_qmm_opt.py 8 > $A/probe_opt_bs8_fast.json 2> $A/probe_opt_bs8_fast.err
log "probe_qmm_opt done rc=$?"

log "bench_kernels (fast window) start"
timeout 2400 python -u bench_kernels.py 8 > $A/kernels_bs8_fast.json 2> $A/kernels_bs8_fast.err
log "bench_kernels done rc=$?"
log "chain2 complete"
