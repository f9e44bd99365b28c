#!/bin/bash
# Round-5 queue 5 (VERDICT r4 #7): statistical hetero serving — 200
# requests x 3 seeds per mode at 1.4B, plus the 7B-int8 inflight_prefix
# row. One process per mode (the TPU tunnel serves one process at a time).
set -u
cd /root/repo
LOG=/tmp/round5_queue5.log
echo "=== round5_queue5 start $(date)" >> "$LOG"

for mode in wave inflight inflight_prefix; do
  echo "--- hetero 1.4B mode=$mode $(date)" >> "$LOG"
  LVR_SERVE_MODE="$mode" LVR_HETERO_N=200 LVR_HETERO_SEEDS=17,43,91 \
    timeout 5400 python benchmarks/run_all.py --only serve_hetero \
    >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 30
done

echo "--- hetero 7B int8 inflight_prefix $(date)" >> "$LOG"
LVR_HETERO_7B=1 LVR_SERVE_MODE=inflight_prefix LVR_HETERO_N=200 \
  LVR_HETERO_SEEDS=17,43,91 timeout 7200 \
  python benchmarks/run_all.py --only serve_hetero >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue5 done $(date)" >> "$LOG"
