#!/bin/bash
# Sequential on-chip bench chain (single TPU; one process at a time).
cd /root/repo
A=artifacts/bench_r02
date -u +"%FT%TZ start" >> $A/chain.log
timeout 1800 python -u bench_kernels.py 8 > $A/kernels_bs8.json 2> $A/kernels_bs8.err
date -u +"%FT%TZ kernels done rc=$?" >> $A/chain.log
BENCH_FORMAT=nvfp4 BENCH_STEPS=64 BENCH_ROUNDS=3 BENCH_MAXLEN=512 timeout 3000 \
  python -u bench.py > $A/nvfp4.json 2> $A/nvfp4.err
date -u +"%FT%TZ nvfp4 done rc=$?" >> $A/chain.log
BENCH_FORMAT=int4 BENCH_LAYOUT=word BENCH_STEPS=64 BENCH_ROUNDS=3 BENCH_MAXLEN=512 timeout 3000 \
  python -u bench.py > $A/int4_word.json 2> $A/int4_word.err
date -u +"%FT%TZ int4w done rc=$?" >> $A/chain.log
BENCH_FORMAT=fp8 BENCH_STEPS=64 BENCH_ROUNDS=3 BENCH_MAXLEN=512 timeout 3000 \
  python -u bench.py > $A/fp8.json 2> $A/fp8.err
date -u +"%FT%TZ fp8 done rc=$?" >> $A/chain.log
