#!/bin/bash
cd /root/repo
A=artifacts/bench_r02
date -u +"%FT%TZ chain2 start" >> $A/chain.log
BENCH_FORMAT=int4 BENCH_LAYOUT=word BENCH_STEPS=64 BENCH_ROUNDS=3 BENCH_MAXLEN=512 timeout 3000 \
  python -u bench.py > $A/int4_word.json 2> $A/int4_word.err
date -u +"%FT%TZ int4w done rc=$?" >> $A/chain.log
BENCH_FORMAT=fp8 BENCH_TTFT=0 BENCH_STEPS=64 BENCH_ROUNDS=3 BENCH_MAXLEN=512 timeout 3000 \
  python -u bench.py > $A/fp8.json 2> $A/fp8.err
date -u +"%FT%TZ fp8 done rc=$?" >> $A/chain.log
BENCH_FORMAT=int8 BENCH_TTFT=0 BENCH_STEPS=64 BENCH_ROUNDS=3 BENCH_MAXLEN=512 timeout 3000 \
  python -u bench.py > $A/int8.json 2> $A/int8.err
date -u +"%FT%TZ int8 done rc=$?" >> $A/chain.log
