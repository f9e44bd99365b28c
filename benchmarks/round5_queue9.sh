#!/bin/bash
# Round-5 queue 9: re-measure 7B b16 decode with the NEW single-pass
# decode attention (models/llama._decode_attention — kills the per-step
# [B,T,H,D] cache transpose the l48 probes exposed: window term was
# 27.6 ms bf16-cache / 25.8 ms int8-cache of a 41.5/39.1 ms step).
# Expected: step ~20 ms bf16-cache, ~17 ms int8-cache if XLA fuses the
# multiply+reduce into the cache read. l48 rerun re-isolates the new
# window term.
set -u
cd /root/repo
LOG=/tmp/round5_queue9.log
echo "=== round5_queue9 start $(date)" >> "$LOG"

for env in "LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8" \
           "LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 LVR_KV_QUANT=int8" \
           "LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 LVR_DECODE_L=48"; do
  echo "--- decode7b $env $(date)" >> "$LOG"
  env $env timeout 5400 python benchmarks/run_all.py --only decode7b \
    >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 30
done

echo "--- decode7b b16 int8 PALLAS flash-decode kernel $(date)" >> "$LOG"
LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 \
  LVR_DECODE_ATTN=pallas timeout 5400 \
  python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 30

echo "--- decode 1.4B family (new attention) $(date)" >> "$LOG"
timeout 3600 python benchmarks/run_all.py --only decode >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue9 done $(date)" >> "$LOG"
