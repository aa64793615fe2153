#!/bin/bash
# Round-4 on-chip chain. Priority order fixed by VERDICT r3 ("get the
# engine-level 4-bit decode number, and get it first"):
#
#   1. engine A/B: int4 {bd2,word} x nvfp4 {word2,word}, BS8 L32, in-session
#      bf16 anchor  -> engine_<fmt>_<layout>.json       (headline)
#   2. native sub-byte probe (jnp.int4 / fp4 convert-dot escalation route)
#   3. BS1/8/64 x {int4,nvfp4,fp8} TTFT grid            -> grid.json
#   4. paged-vs-dense at equal format/batch/context     -> paged*.json
#   5. canonical kernel microbench (slope methodology)
#
# Robustness rules (VERDICT r3 weak #6): every step's success test is
# "artifact exists, non-empty, parses as JSON" (never a log line); one
# retry per step; health re-gate between steps; everything appends to
# chain.log with timestamps.
cd /root/repo
A=artifacts/bench_r04
mkdir -p $A
log() { echo "$(date -u +%FT%TZ) $*" >> $A/chain.log; }

json_ok() { python -c "
import json,sys
d=json.load(open('$1'))
sys.exit(0 if d else 1)" 2>/dev/null; }

health_gate() {
  # small matmul must round-trip < 15 s twice in a row
  local ok=0 t0 rc dt
  while [ $ok -lt 2 ]; do
    t0=$(date +%s)
    timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((512,512), jnp.bfloat16)
for _ in range(3): x = x @ x * 0 + x
np.asarray(x[0,0])" 2>/dev/null
    rc=$?; dt=$(( $(date +%s) - t0 ))
    if [ $rc -eq 0 ] && [ $dt -lt 15 ]; then
      ok=$((ok+1)); log "health ok (${dt}s) [$ok/2]"
    else
      ok=0; log "health slow/fail rc=$rc (${dt}s); sleeping 120"
      sleep 120
    fi
  done
}

run_step() {  # name out_json timeout cmd...
  local name=$1 out=$2 to=$3; shift 3
  for attempt in 1 2; do
    log "$name start (attempt $attempt)"
    timeout "$to" "$@" > "$out" 2> "${out%.json}.err"
    local rc=$?
    if json_ok "$out"; then
      log "$name ok rc=$rc"
      return 0
    fi
    log "$name BAD ARTIFACT rc=$rc (empty/unparseable $out); $([ $attempt = 1 ] && echo re-gating health + retrying || echo giving up)"
    [ $attempt = 1 ] && health_gate
  done
  return 1
}

log "=== r04 chain start ==="
health_gate

# --- step 1: HEADLINE engine A/B -------------------------------------------
ab_cell() {  # fmt layout
  BENCH_FORMAT=$1 BENCH_LAYOUT=$2 BENCH_TTFT=0 BENCH_ROUNDS=3 \
  BENCH_DEADLINE=1300 \
  run_step "engineAB $1/$2" "$A/engine_$1_$2.json" 1800 python -u bench.py
}
ab_cell int4 bd2
ab_cell int4 xla
ab_cell nvfp4 word2
ab_cell int4 word
ab_cell nvfp4 word
log "step1 engine A/B done"

# --- step 2: native sub-byte convert-dot probe -----------------------------
health_gate
run_step "probe_int4_native" "$A/probe_native_bs8.json" 1800 \
  python -u tools/probe_int4_native.py 8

# --- step 2.5: anchor retrain (long-range corpus, seq 448) -----------------
# The shipped anchor (seq=256, trained before the long-range context-doc
# corpus landed) retrieves needles only within ~60 tokens, which made the
# r03 RULER dense baseline ~0 and its calibration vacuous (VERDICT r3 weak
# #3). ~8 min on-chip in r03. RULER curve + accuracy tables re-run on CPU
# against the new checkpoint afterwards.
log "train llama anchor (seq448 long-range) start"
ANCHOR_SEQ=448 ANCHOR_STEPS=20000 timeout 4000 python -u tools/train_anchor.py \
  > $A/train_llama.log 2>&1
log "train llama anchor done rc=$?"
log "train moe anchor start"
MOE_STEPS=1500 MOE_TPU=1 timeout 2400 python -u tools/train_moe_anchor.py \
  > $A/train_moe.log 2>&1
log "train moe anchor done rc=$?"

# --- step 3: the grid ------------------------------------------------------
health_gate
GRID_OUT=$A run_step "grid" "$A/grid_run.json" 14400 python -u tools/bench_grid.py

# --- step 4: paged vs dense, same format/batch/context ---------------------
health_gate
BENCH_FORMAT=int4 BENCH_BS=8 BENCH_MAXLEN=1024 BENCH_PREFILL=512 \
BENCH_TTFT=0 BENCH_ROUNDS=3 BENCH_ANCHOR=0 BENCH_DEADLINE=1300 \
  run_step "paged_dense_ref" "$A/paged_dense_ref.json" 1800 python -u bench.py
PAGED_CTX=512 PAGED_SLOTS=8 PAGED_UNROLL=8 PAGED_STEPS=64 \
  run_step "paged_unroll8" "$A/paged_unroll8.json" 1800 python -u tools/bench_paged.py
PAGED_CTX=512 PAGED_SLOTS=8 PAGED_UNROLL=1 PAGED_STEPS=32 \
  run_step "paged_unroll1" "$A/paged_unroll1.json" 1800 python -u tools/bench_paged.py

# --- step 5: canonical kernel microbench -----------------------------------
health_gate
run_step "kernels" "$A/kernels_bs8.json" 2400 python -u bench_kernels.py 8

log "=== r04 chain complete ==="
