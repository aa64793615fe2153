#!/bin/bash
# Round-5 chain 2: the reference-scenario grid at HEAD (VERDICT r4 #3).
# 2048-in / 64-step decode, BS 1/8/64 x {fp8, int4-a8 (W4A8), int4-bd2
# (weight-only bd3 schedule), nvfp4-word2, nvfp4-i8 (W8A8 recast)} with
# per-BS bf16 anchors, TTFT everywhere (a8 prefill fixed this round),
# drift sentinel. BS64 stores KV int8 on both sides (grid64c protocol);
# whether BS64 also uses the packed-KV kernel is decided from chain1b's
# int8-KV A/B (kernel vs XLA at 2048-in).
cd /root/repo
A=artifacts/bench_r05
mkdir -p $A
log() { echo "$(date -u +%FT%TZ) $*" >> $A/chain2.log; }

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
      ok=$((ok+1)); log "health ok (${dt}s) [$ok/2]"
    else
      ok=0; log "health slow/fail rc=$rc (${dt}s); sleeping 120"
      sleep 120
      waited=$((waited + 122 + dt)); [ $waited -ge 1200 ] && bar=70
    fi
  done
}

log "=== r05 chain2 queued (waits for chain1b) ==="
while [ ! -f $A/chain1b.done ]; do sleep 60; done
health_gate

KVK64=$(python - <<'EOF'
import json
try:
    kvk = json.load(open("artifacts/bench_r05/engine_a8_int8kv_kvk2_2k.json"))
    ref_ms = 15.582  # chain1 a8_int8kv_ref_2k
    print(1 if kvk.get("step_ms", 1e9) < ref_ms else 0)
except Exception:
    print(0)
EOF
)
log "GRID_KVK64=$KVK64 (batched-kernel int8-KV A/B decision)"

GRID_OUT=$A GRID_FORMATS="fp8,int4,nvfp4,nvfp4:i8" \
  GRID_KV64=int8 GRID_KVK64=$KVK64 GRID_CELL_TIMEOUT=1800 \
  timeout 21600 python -u tools/bench_grid.py >> $A/chain2.log 2>&1
log "=== r05 chain2 complete ==="
touch $A/chain2.done
