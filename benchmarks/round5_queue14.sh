#!/bin/bash
# Round-5 queue 14: flash-decode lowering isolation — (a) standalone
# kernel probes (default layouts, no scan); (b) chunk program with the
# cache PINNED to default layout (LVR_CHUNK_CACHE_AUTO=0): negotiated
# AUTO layouts on pallas_call operands are the remaining crash suspect.
set -u
cd /root/repo
LOG=/tmp/round5_queue14.log
echo "=== round5_queue14 start $(date)" >> "$LOG"

for args in "stacked" "stacked kv8" "plain"; do
  echo "--- probe $args $(date)" >> "$LOG"
  timeout 3600 python benchmarks/probe_pallas_decode.py $args >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 20
done

echo "--- decode7b stacked kernel, cache layout pinned default $(date)" >> "$LOG"
LVR_DECODE_B=16 LVR_DECODE_CHUNK=8 LVR_DECODE_QUANT=int8 \
  LVR_DECODE_ATTN=pallas_stacked LVR_CHUNK_CACHE_AUTO=0 timeout 5400 \
  python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue14 done $(date)" >> "$LOG"
