#!/bin/bash
# Round-4 chain 4: the BS64 grid row, retried with the packed NVFP4 KV
# cache. The first grid run measured BS1/BS8 cleanly (sentinel drift
# 1.002) but every BS64 cell RESOURCE_EXHAUSTED: at 64 x 2304 tokens the
# KV cache is ~9.7 GB in bf16 / ~4.9 GB in int8, which plus weights
# overflows the 15.75 GB chip. The r04 packed NVFP4 cache stores E2M1
# nibbles + E4M3 block scales (~2.8 GB) on BOTH the anchor and format
# sides — same-format comparison stays fair.
cd /root/repo
A=artifacts/bench_r04
mkdir -p $A/grid64
log() { echo "$(date -u +%FT%TZ) $*" >> $A/chain4.log; }

health_gate() {
  # bar relaxes 15s -> 70s after 20 min of waiting: every engine cell is
  # internally anchored (in-session bf16 leg shares the window), so a
  # moderate window yields honest RATIOS; only absolute tok/s softens.
  # The bar used is logged so artifacts can be read accordingly.
  local ok=0 t0 rc dt waited=0 bar=15
  while [ $ok -lt 2 ]; do
    t0=$(date +%s)
    timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((512,512), jnp.bfloat16)
for _ in range(3): x = x @ x * 0 + x
np.asarray(x[0,0])" 2>/dev/null
    rc=$?; dt=$(( $(date +%s) - t0 ))
    if [ $rc -eq 0 ] && [ $dt -lt $bar ]; then
      ok=$((ok+1)); log "health ok (${dt}s, bar ${bar}) [$ok/2]"
    else
      ok=0; log "health slow/fail rc=$rc (${dt}s, bar ${bar}); sleeping 120"
      sleep 120
      waited=$((waited + 122 + dt))
      [ $waited -ge 1200 ] && bar=70
    fi
  done
}

log "=== r04 chain4 queued (waiting for chain3) ==="
while ! grep -q "r04 chain3 complete" $A/chain3.log 2>/dev/null; do
  sleep 60
done
log "chain3 complete; starting BS64 grid row (nvfp4 KV)"
health_gate

GRID_OUT=$A/grid64 GRID_BS=64 GRID_KV64=nvfp4 GRID_CELL_TIMEOUT=1800 \
  timeout 9000 python -u tools/bench_grid.py \
  > $A/grid64/grid_run.json 2> $A/grid64/grid_run.err
log "grid64 done rc=$? ($(wc -c < $A/grid64/grid.json 2>/dev/null || echo 0) bytes)"

log "=== r04 chain4 complete ==="
