#!/bin/bash
# Round-4 CPU-side work, queued on the on-chip anchor retrains finishing.
# Runs entirely on the CPU backend (no chip contention with the bench
# chains): the 600-question accuracy tables (VERDICT r3 item #5) and the
# re-gated RULER calibration on the seq448 long-range anchor (item #4).
cd /root/repo
A=artifacts/bench_r04
mkdir -p $A
log() { echo "$(date -u +%FT%TZ) $*" >> $A/cpu.log; }

log "=== r04 cpu queue start (waiting for llama anchor retrain) ==="
while ! grep -q "train llama anchor done" $A/chain.log 2>/dev/null; do
  sleep 60
done
rc=$(grep "train llama anchor done" $A/chain.log | tail -1 | grep -o "rc=[0-9]*")
log "llama anchor retrain finished ($rc)"

log "ruler_curve (CPU) start"
RULER_CPU=1 timeout 7200 python -u tools/ruler_curve.py \
  > $A/ruler_cpu.log 2>&1
log "ruler_curve done rc=$? ($(wc -c < artifacts/ruler_curve.json 2>/dev/null || echo 0) bytes)"

log "accuracy_table (CPU, 600q) start"
ACC_CPU=1 timeout 21600 python -u tools/accuracy_table.py \
  > $A/accuracy_cpu.log 2>&1
log "accuracy_table done rc=$?"

while ! grep -q "train moe anchor done" $A/chain.log 2>/dev/null; do
  sleep 60
done
log "moe_accuracy_table (CPU) start"
timeout 7200 python -u tools/moe_accuracy_table.py > $A/moe_accuracy_cpu.log 2>&1
log "moe_accuracy_table done rc=$?"
log "=== r04 cpu queue complete ==="
