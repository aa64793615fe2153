#!/bin/bash
cd /root/repo
A=artifacts/bench_r02
date -u +"%FT%TZ chain3 start" >> $A/chain.log
ABLATE_FORMATS=bf16,int4,nvfp4 ABLATE_LAYERS=32 timeout 2400 \
  python -u tools/ablate_decode.py > $A/ablate.json 2> $A/ablate.err
date -u +"%FT%TZ ablate done rc=$?" >> $A/chain.log
PAGED_KERNEL=1 timeout 1800 python -u tools/bench_paged.py > $A/paged_kernel.json 2> $A/paged_kernel.err
date -u +"%FT%TZ paged_kernel done rc=$?" >> $A/chain.log
PAGED_KERNEL=0 timeout 1200 python -u tools/bench_paged.py > $A/paged_gather.json 2> $A/paged_gather.err
date -u +"%FT%TZ paged_gather done rc=$?" >> $A/chain.log
timeout 1500 python -u tools/bench_serve.py --format int4 --requests 16 --prefix_cache > $A/serve_int4.json 2> $A/serve_int4.err
date -u +"%FT%TZ serve done rc=$?" >> $A/chain.log
