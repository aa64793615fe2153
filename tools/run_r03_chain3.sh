#!/bin/bash
# Round-3 chain 3 (CPU): accuracy artifacts, gated on the retrained anchors.
# Runs the per-preset accuracy tables (hardened MMLU: hops/reverse/near-miss
# subjects + in-context override docs) and the RULER attention-sparsity
# curve. CPU-bound — the chip stays free for the serving benches.
cd /root/repo
A=artifacts/bench_r03
mkdir -p $A
log() { date -u +"%FT%TZ $*" >> $A/chain.log; }

# gate: wait for chain2's llama-anchor training to finish successfully
while ! grep -q "train llama anchor done rc=0" $A/chain.log 2>/dev/null; do
  if grep -q "train llama anchor done rc=" $A/chain.log 2>/dev/null; then
    log "chain3 abort: llama anchor training failed"; exit 1
  fi
  sleep 60
done
log "chain3 start (anchor ready)"

log "accuracy_table start"
ACC_CPU=1 timeout 7000 python -u tools/accuracy_table.py \
  > $A/accuracy_table.log 2>&1
log "accuracy_table done rc=$?"

# MoE table needs the MoE anchor (trained after llama in chain2)
while ! grep -q "train moe anchor done rc=" $A/chain.log 2>/dev/null; do
  sleep 60
done
if grep -q "train moe anchor done rc=0" $A/chain.log; then
  log "moe_accuracy_table start"
  MOE_ACC_CPU=1 ACC_CPU=1 timeout 5000 python -u tools/moe_accuracy_table.py \
    > $A/moe_accuracy_table.log 2>&1
  log "moe_accuracy_table done rc=$?"
else
  log "moe anchor failed; skipping moe table"
fi

log "ruler_curve start"
RULER_CPU=1 timeout 5000 python -u tools/ruler_curve.py \
  > $A/ruler_curve.log 2>&1
log "ruler_curve done rc=$?"
log "chain3 complete"
