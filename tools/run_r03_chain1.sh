#!/bin/bash
# Round-3 on-chip chain 1: relay-health gate -> kernel-variant probe ->
# standard kernel microbench. Writes artifacts/bench_r03/.
cd /root/repo
A=artifacts/bench_r03
mkdir -p $A
log() { date -u +"%FT%TZ $*" >> $A/chain.log; }
log "chain1 start"

# health gate: a small matmul must round-trip in < 15 s twice in a row
# (the 2026-08-19 window measured 83 s; probes from such a window are noise)
ok=0
while [ $ok -lt 2 ]; do
  t0=$(date +%s)
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((512,512), jnp.bfloat16)
for _ in range(3): x = x @ x * 0 + x
np.asarray(x[0,0])" 2>/dev/null
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  if [ $rc -eq 0 ] && [ $dt -lt 15 ]; then
    ok=$((ok+1)); log "health ok (${dt}s) [$ok/2]"
  else
    ok=0; log "health slow/fail rc=$rc (${dt}s); sleeping 120"
    sleep 120
  fi
done

log "probe_qmm_opt start"
timeout 2400 python -u tools/probe_qmm_opt.py 8 > $A/probe_opt_bs8.json 2> $A/probe_opt_bs8.err
log "probe_qmm_opt done rc=$?"

log "bench_kernels start"
timeout 2400 python -u bench_kernels.py 8 > $A/kernels_bs8.json 2> $A/kernels_bs8.err
log "bench_kernels done rc=$?"
log "chain1 complete"
