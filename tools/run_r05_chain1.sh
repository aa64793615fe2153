#!/bin/bash
# Round-5 chain 1: engine-level A/B of the packed-KV Pallas decode
# attention (EngineConfig.kv_attention_kernel, commit 5507990) — first
# on-chip job of the round, per the r4 "engine A/B first" lesson.
#
# Phase A (BS8, prefill 128, ctx 512 — r4-comparable): kvk on/off for
#   int4-a8 + int8 KV, nvfp4 + packed-nvfp4 KV, and a8 + bf16-KV kvk.
# Phase B (BS8, 2048-in reference scenario): same A/B where attention
#   actually dominates; this is the regime the kernel exists for.
cd /root/repo
A=artifacts/bench_r05
mkdir -p $A
log() { echo "$(date -u +%FT%TZ) $*" >> $A/chain1.log; }

json_ok() { python -c "
import json,sys
d=json.load(open('$1'))
sys.exit(0 if d else 1)" 2>/dev/null; }

health_gate() {
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

cell() {  # name extra_env...
  local name=$1; shift
  log "cell $name starting"
  env "$@" BENCH_TTFT=0 BENCH_ROUNDS=3 BENCH_DEADLINE=1300 \
    timeout 1800 python -u bench.py > "$A/engine_$name.json" \
    2> "$A/engine_$name.err"
  if json_ok "$A/engine_$name.json"; then
    log "cell $name ok: $(python -c "
import json; d=json.load(open('$A/engine_$name.json'))
print(d['value'], 'tok/s x', d.get('vs_baseline'), 'step_ms', d.get('step_ms'))")"
  else
    log "cell $name BAD ARTIFACT: $(tail -c 300 $A/engine_$name.err | tr '\n' ' ')"
  fi
}

log "=== r05 chain1: packed-KV decode attention A/B ==="
health_gate

# Phase A: BS8 / prefill 128 / ctx 512 (r4-comparable)
cell a8_int8kv_ref  BENCH_FORMAT=int4 BENCH_KV=int8
cell a8_int8kv_kvk  BENCH_FORMAT=int4 BENCH_KV=int8 BENCH_KVK=1
cell a8_kvk         BENCH_FORMAT=int4 BENCH_KVK=1
cell nvfp4_nvkv_ref BENCH_FORMAT=nvfp4 BENCH_KV=nvfp4
cell nvfp4_nvkv_kvk BENCH_FORMAT=nvfp4 BENCH_KV=nvfp4 BENCH_KVK=1

# Phase B: 2048-in reference scenario (attention-dominant regime)
B2="BENCH_PREFILL=2048 BENCH_MAXLEN=2304"
cell a8_int8kv_ref_2k  BENCH_FORMAT=int4 BENCH_KV=int8 BENCH_PREFILL=2048 BENCH_MAXLEN=2304
cell a8_int8kv_kvk_2k  BENCH_FORMAT=int4 BENCH_KV=int8 BENCH_KVK=1 BENCH_PREFILL=2048 BENCH_MAXLEN=2304
cell nvfp4_nvkv_ref_2k BENCH_FORMAT=nvfp4 BENCH_KV=nvfp4 BENCH_PREFILL=2048 BENCH_MAXLEN=2304
cell nvfp4_nvkv_kvk_2k BENCH_FORMAT=nvfp4 BENCH_KV=nvfp4 BENCH_KVK=1 BENCH_PREFILL=2048 BENCH_MAXLEN=2304
cell fp8_int8kv_kvk_2k BENCH_FORMAT=fp8 BENCH_KV=int8 BENCH_KVK=1 BENCH_PREFILL=2048 BENCH_MAXLEN=2304

log "=== r05 chain1 complete ==="
touch $A/chain1.done
