#!/bin/bash
# Round-4 chain 3: W4A8 native serving (int4_layout="a8") on-chip, queued
# after chain2's bd2-schedule sweep. The reference's W4A8 rows are its
# fastest 4-bit format at batch (benchmark.md:23-25); qmm_int4_w48 decodes
# nibbles to int8 (~0.4 VPU ops/elem) and rides the s8xs8 MXU path.
cd /root/repo
A=artifacts/bench_r04
mkdir -p $A
log() { echo "$(date -u +%FT%TZ) $*" >> $A/chain3.log; }

json_ok() { python -c "
import json,sys
d=json.load(open('$1'))
sys.exit(0 if d else 1)" 2>/dev/null; }

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

log "=== r04 chain3 queued (waiting for chain2) ==="
while ! grep -q "r04 chain2 complete" $A/chain2.log 2>/dev/null; do
  sleep 60
done
log "chain2 complete; starting W4A8 cells"
health_gate

run_cell() {  # name env... -- (bench.py implied)
  local name=$1; shift
  env "$@" BENCH_TTFT=0 BENCH_ROUNDS=3 BENCH_DEADLINE=1300 \
    timeout 1800 python -u bench.py > "$A/engine_$name.json" \
    2> "$A/engine_$name.err"
  if json_ok "$A/engine_$name.json"; then
    log "cell $name ok"
  else
    log "cell $name BAD ARTIFACT"
  fi
}

run_cell int4_a8 BENCH_FORMAT=int4 BENCH_LAYOUT=a8
run_cell int4_a8_to512 BENCH_FORMAT=int4 BENCH_LAYOUT=a8 QMM_TILE_O=512

health_gate
KB_VARIANTS=bf16_xla,int4_bd2,int4_w48 timeout 2400 \
  python -u bench_kernels.py 8 > "$A/kernels_w48.json" \
  2> "$A/kernels_w48.err"
json_ok "$A/kernels_w48.json" && log "kernels_w48 ok" || log "kernels_w48 BAD"

log "=== r04 chain3 complete ==="
