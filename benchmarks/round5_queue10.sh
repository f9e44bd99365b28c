#!/bin/bash
# Round-5 queue 10: pipeline e2e rerun after the driver-holds-the-tunnel
# fix (bundle now built in a CPU subprocess; full phase stderr kept in
# /tmp/lvr_pipeline_phase.log), then the 7B hetero rerun (queue8 body).
set -u
cd /root/repo
LOG=/tmp/round5_queue10.log
echo "=== round5_queue10 start $(date)" >> "$LOG"

echo "--- pipeline e2e on-chip (fixed driver) $(date)" >> "$LOG"
timeout 7200 python benchmarks/run_all.py --only pipeline >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 30

echo "--- hetero 7B int8+kv8 inflight_prefix $(date)" >> "$LOG"
LVR_HETERO_7B=1 LVR_SERVE_MODE=inflight_prefix LVR_HETERO_N=200 \
  LVR_HETERO_SEEDS=17,43,91 timeout 7200 \
  python benchmarks/run_all.py --only serve_hetero >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue10 done $(date)" >> "$LOG"
