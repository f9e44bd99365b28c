#!/bin/bash
# Round-4 pending on-chip measurements (VERDICT r3 #3, #2, #10).
# One TPU process at a time; one measurement per process (CLAUDE.md:
# remote compile latency is variable — budget generously).
set -u
cd /root/repo
LOG=/tmp/round4_queue.log
echo "=== round4_queue start $(date)" >> "$LOG"

for mode in wave inflight inflight_prefix; do
  echo "--- serve_hetero $mode $(date)" >> "$LOG"
  LVR_SERVE_MODE="$mode" timeout 5400 \
    python benchmarks/run_all.py --only serve_hetero >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 20
done

echo "--- spec 7B int8 $(date)" >> "$LOG"
LVR_SPEC_7B=1 LVR_DECODE_QUANT=int8 timeout 5400 \
  python benchmarks/run_all.py --only spec >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- serve 7B inflight int8 $(date)" >> "$LOG"
LVR_SERVE_7B=1 timeout 5400 \
  python benchmarks/run_all.py --only serve >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round4_queue done $(date)" >> "$LOG"
