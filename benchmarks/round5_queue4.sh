#!/bin/bash
# Round-5 queue 4: int8-KV decode follow-ups — default cache layout
# (AUTO may pessimize the int8 read) and the b32 point the quarter-size
# cache newly unlocks.
set -u
cd /root/repo
LOG=/tmp/round5_queue4.log
echo "=== round5_queue4 start $(date)" >> "$LOG"

run() {
  echo "--- decode7b $* $(date)" >> "$LOG"
  LVR_DECODE_B="$1" LVR_DECODE_CHUNK="$2" LVR_CHUNK_CACHE_AUTO="$3" \
    LVR_DECODE_QUANT=int8 LVR_KV_QUANT=int8 timeout 5400 \
    python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 30
}

run 8 16 0
run 16 8 0
run 32 8 1

echo "=== round5_queue4 done $(date)" >> "$LOG"
