#!/bin/bash
# Round-5 queue 13: (a) stacked flash-decode retry with the 3D MHA
# specialization (generic G-dim body crashed Mosaic); (b) pipeline e2e
# attempt 4 — cache-friendly batch shapes (b64 ViT / b8 SD) + 2h phase
# timeouts.
set -u
cd /root/repo
LOG=/tmp/round5_queue13.log
echo "=== round5_queue13 start $(date)" >> "$LOG"

echo "--- decode7b b16 int8 stacked-MHA kernel $(date)" >> "$LOG"
LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 \
  LVR_DECODE_ATTN=pallas_stacked timeout 5400 \
  python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 30

echo "--- decode7b b16 int8 kv8 stacked-MHA kernel $(date)" >> "$LOG"
LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 \
  LVR_KV_QUANT=int8 LVR_DECODE_ATTN=pallas_stacked timeout 5400 \
  python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 30

echo "--- pipeline e2e attempt 4 $(date)" >> "$LOG"
timeout 10800 python benchmarks/run_all.py --only pipeline >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue13 done $(date)" >> "$LOG"
