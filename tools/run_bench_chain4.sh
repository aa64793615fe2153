#!/bin/bash
cd /root/repo
A=artifacts/bench_r02
# wait for chain3 to finish (it writes serve done last)
while ! grep -q "serve done" $A/chain.log; do sleep 20; done
date -u +"%FT%TZ chain4 start" >> $A/chain.log
ABLATE_FORMATS=bf16,int4,nvfp4 ABLATE_LAYERS=16 timeout 2400 \
  python -u tools/ablate_decode.py > $A/ablate_l16.json 2> $A/ablate_l16.err
date -u +"%FT%TZ ablate_l16 done rc=$?" >> $A/chain.log
