#!/bin/bash
# Round-3 on-chip chain 4: engine-level serving-layout A/B (fast-window
# gated). Decides the int4/nvfp4 serving-layout defaults on ENGINE decode
# numbers, not just kernel microbenches: int4 word vs bd2, nvfp4 word vs
# word2 (BS8 L32, in-session bf16 anchor, TTFT off for speed).
cd /root/repo
A=artifacts/bench_r03
mkdir -p $A
log() { date -u +"%FT%TZ $*" >> $A/chain.log; }

# wait for chain2 to release the chip
while ! grep -q "chain2 complete" $A/chain.log 2>/dev/null; do sleep 60; done
log "chain4 start"

run_cell() {  # fmt layout outfile
  log "engine A/B $1/$2 start"
  BENCH_FORMAT=$1 BENCH_LAYOUT=$2 BENCH_TTFT=0 BENCH_ROUNDS=3 \
  BENCH_DEADLINE=1500 timeout 2000 python -u bench.py \
    > $A/$3.json 2> $A/$3.err
  log "engine A/B $1/$2 done rc=$?"
}

run_cell int4 bd2 engine_int4_bd2
run_cell int4 word engine_int4_word
run_cell nvfp4 word2 engine_nvfp4_word2
run_cell nvfp4 word engine_nvfp4_word
log "chain4 complete"
