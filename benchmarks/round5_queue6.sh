#!/bin/bash
# Round-5 queue 6: (a) decode cache-term isolation probes — the same
# b16 chunk program over a 48-token window; step@l512 - step@l48 IS the
# measured per-step cache/attention cost for bf16 vs int8 caches;
# (b) the production law pipeline end-to-end on the chip (VERDICT r4 #3).
set -u
cd /root/repo
LOG=/tmp/round5_queue6.log
echo "=== round5_queue6 start $(date)" >> "$LOG"

echo "--- decode7b b16 int8 bf16-cache l48 $(date)" >> "$LOG"
LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 LVR_DECODE_L=48 \
  timeout 5400 python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 30

echo "--- decode7b b16 int8 kv8 l48 $(date)" >> "$LOG"
LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 LVR_KV_QUANT=int8 \
  LVR_DECODE_L=48 timeout 5400 \
  python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 30

echo "--- pipeline e2e on-chip $(date)" >> "$LOG"
timeout 7200 python benchmarks/run_all.py --only pipeline >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue6 done $(date)" >> "$LOG"
