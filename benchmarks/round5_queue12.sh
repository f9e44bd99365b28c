#!/bin/bash
# Round-5 queue 12: (a) pipeline e2e third attempt — now with transient-
# relay retry around the clamp-guard compile + extraction dispatch;
# (b) stacked flash-decode kernel rows (queue11 body); (c) spec+kv8 and
# chunk16 rows (queue7 body).
set -u
cd /root/repo
LOG=/tmp/round5_queue12.log
echo "=== round5_queue12 start $(date)" >> "$LOG"

echo "--- pipeline e2e on-chip (retry-hardened) $(date)" >> "$LOG"
timeout 9000 python benchmarks/run_all.py --only pipeline >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 30

for env in "LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 LVR_DECODE_ATTN=pallas_stacked" \
           "LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 LVR_KV_QUANT=int8 LVR_DECODE_ATTN=pallas_stacked"; do
  echo "--- decode7b $env $(date)" >> "$LOG"
  env $env timeout 5400 python benchmarks/run_all.py --only decode7b \
    >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 30
done

echo "--- spec7b int8 kv8 b4 $(date)" >> "$LOG"
LVR_SPEC_7B=1 LVR_DECODE_QUANT=int8 LVR_KV_QUANT=int8 LVR_DECODE_B=4 \
  timeout 5400 python benchmarks/run_all.py --only spec >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 30

echo "--- decode7b b16 chunk16 int8 kv8 $(date)" >> "$LOG"
LVR_DECODE_B=16 LVR_DECODE_CHUNK=16 LVR_DECODE_QUANT=int8 \
  LVR_KV_QUANT=int8 timeout 5400 \
  python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "--- decode 1.4B family $(date)" >> "$LOG"
timeout 3600 python benchmarks/run_all.py --only decode >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue12 done $(date)" >> "$LOG"
