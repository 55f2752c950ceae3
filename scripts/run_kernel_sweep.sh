#!/bin/bash
# Round-3 kernel sweep at the b64 operating point. One TPU process at a time.
cd /root/repo
set -x
timeout 5400 python scripts/bench_int8.py --batch 64 --iters 20 \
  --only int8_skip_stem1,int8_exit_pallas,int8_down,int8_headdec,int8_kitchen,int8_c3,int8_kitchen_c3,int8_pointwise,int8_all,int8_region,int8_regionfull,int8_regionfast,int8_headmm \
  2>&1 | tee /tmp/sweep_r3.txt
