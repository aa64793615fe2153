#!/bin/bash
# Round-5 chain 3 (queued on chain2/grid): the remaining on-chip artifacts.
#  1. 8B continuous batching at scale (VERDICT r4 #5): scheduler + paged
#     KV + prefix cache at 8B W4A8, realistic mix, TTFT p50/p95 + slot
#     utilization + tok/s.
#  2. Speculative decoding on the engine (VERDICT #8): trained-anchor
#     W4A8 end-to-end + 8B verify-cost envelope.
#  3. Diffusion PTQ latency (VERDICT #9): DiT-XL/2 denoise step bf16 vs
#     INT8 vs FP8 + quality proxy.
#  4. RULER retrieval anchor (VERDICT #7): train artifacts/anchor-ruler on
#     the retrieval-heavy curriculum, then rerun the sparsity calibration
#     curve on it.
cd /root/repo
A=artifacts/bench_r05
mkdir -p $A
log() { echo "$(date -u +%FT%TZ) $*" >> $A/chain3.log; }

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

log "=== r05 chain3 queued (waits for chain2) ==="
while [ ! -f $A/chain2.done ]; do sleep 60; done
health_gate

log "0a) nvfp4-i8 BS1 cell (timed out pre-fix in the grid)"
env BENCH_FORMAT=nvfp4 BENCH_LAYOUT=i8 BENCH_BS=1 BENCH_PREFILL=2048 \
  BENCH_MAXLEN=2304 BENCH_KV=none BENCH_KVK=0 BENCH_ANCHOR=0 \
  BENCH_ROUNDS=3 BENCH_TTFT=1 BENCH_DEADLINE=1300 \
  timeout 1800 python -u bench.py > $A/grid_i8_bs1.json 2> $A/grid_i8_bs1.err
log "i8_bs1: $(head -c 300 $A/grid_i8_bs1.json)"

log "0) TTFT re-check: fused-kernel prefill (decompress route off)"
for fmt in int4 nvfp4; do
  env BENCH_FORMAT=$fmt BENCH_BS=1 BENCH_PREFILL=2048 BENCH_MAXLEN=2304 \
    BENCH_KV=none BENCH_KVK=0 BENCH_ANCHOR=0 BENCH_ROUNDS=2 BENCH_STEPS=32 \
    BENCH_TTFT=1 BENCH_TTFT_REPEATS=5 BENCH_DEADLINE=900 \
    timeout 1200 python -u bench.py > $A/ttft_fused_$fmt.json \
    2> $A/ttft_fused_$fmt.err
  log "ttft_fused_$fmt: $(head -c 300 $A/ttft_fused_$fmt.json)"
done

log "1) 8B continuous batching (W4A8 a8, int8 KV, unroll 8, prefix cache)"
timeout 3600 python -u tools/bench_serve.py --llama8b --format int4 \
  --layout a8 --kv int8 --requests 24 --prompt_len 1024 --shared_prefix 256 \
  --new_tokens 128 --max_slots 8 --unroll 8 --prefix_cache \
  > $A/serve_8b.json 2> $A/serve_8b.err
log "serve_8b: $(head -c 400 $A/serve_8b.json)"

health_gate
log "4) RULER anchor training (retrieval curriculum, seq 448)"
ANCHOR_RETRIEVAL=1 ANCHOR_STEPS=24000 ANCHOR_SEQ=448 ANCHOR_BATCH=16 \
  timeout 7200 python -u tools/train_anchor.py \
  > $A/train_ruler_anchor.log 2>&1
log "anchor-ruler trained: $(tail -c 300 $A/train_ruler_anchor.log | tr '\n' ' ')"

log "4b) RULER curve on the retrieval anchor"
RULER_ANCHOR=artifacts/anchor-ruler timeout 3600 python -u \
  tools/ruler_curve.py > $A/ruler_curve_r05.log 2>&1
log "ruler: $(tail -c 400 $A/ruler_curve_r05.log | tr '\n' ' ')"

health_gate
log "2a) specdec: trained-anchor W4A8 end-to-end"
SPECDEC_TRAIN=400 SPECDEC_TOKENS=96 timeout 2400 python -u \
  tools/bench_specdec_engine.py --phase anchor \
  > $A/specdec_anchor.json 2> $A/specdec_anchor.err
log "specdec_anchor: $(head -c 400 $A/specdec_anchor.json)"

log "2b) specdec: 8B verify-cost envelope"
timeout 2400 python -u tools/bench_specdec_engine.py --phase 8b \
  > $A/specdec_8b.json 2> $A/specdec_8b.err
log "specdec_8b: $(head -c 400 $A/specdec_8b.json)"

health_gate
log "3) diffusion PTQ latency (DiT-XL/2 class)"
timeout 3600 python -u tools/bench_diffusion.py \
  > $A/diffusion.json 2> $A/diffusion.err
log "diffusion: $(cat $A/diffusion.json | tr '\n' ' ' | head -c 500)"

log "=== r05 chain3 complete ==="
touch $A/chain3.done
