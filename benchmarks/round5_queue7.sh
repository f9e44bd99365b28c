#!/bin/bash
# Round-5 queue 7: decode levers past the 409.7 tok/s row —
# (a) speculative 7B int8 + int8 KV cache (the spec loop's verify
#     forward now reads the quantized cache; compare 357.7 b4 int8);
# (b) b16 chunk16 int8+kv8 (amortize the relay 16x at the b16 point;
#     compare chunk8's 389.3 cachedef / 409.7 auto-layout rows).
set -u
cd /root/repo
LOG=/tmp/round5_queue7.log
echo "=== round5_queue7 start $(date)" >> "$LOG"

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

echo "=== round5_queue7 done $(date)" >> "$LOG"
