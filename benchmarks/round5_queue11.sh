#!/bin/bash
# Round-5 queue 11: flash-decode STACKED kernel rows — block-indexes the
# stacked [L,B,T,KV,D] cache via scalar-prefetch (no per-layer slice
# materialization, no transpose): the two mechanisms the l48 probes and
# the null XLA-reformulation result leave as candidates for the ~27 ms
# b16 window term.
set -u
cd /root/repo
LOG=/tmp/round5_queue11.log
echo "=== round5_queue11 start $(date)" >> "$LOG"

for env in "LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 LVR_DECODE_ATTN=pallas_stacked" \
           "LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 LVR_KV_QUANT=int8 LVR_DECODE_ATTN=pallas_stacked"; do
  echo "--- decode7b $env $(date)" >> "$LOG"
  env $env timeout 5400 python benchmarks/run_all.py --only decode7b \
    >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 30
done

echo "=== round5_queue11 done $(date)" >> "$LOG"
