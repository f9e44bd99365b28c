#!/bin/bash
# Round-5 queue 8: 7B-int8 hetero rerun after the OOM fix (int8 KV
# cache + 4-entry prefix LRU — each stored prompt row at 7B is ~400 MB
# int8 vs ~800 MB bf16; the first attempt filled a 64-entry bf16 store
# during warmup and OOM'd, surfacing as opaque HTTP 400s).
set -u
cd /root/repo
LOG=/tmp/round5_queue8.log
echo "=== round5_queue8 start $(date)" >> "$LOG"

echo "--- hetero 7B int8+kv8 inflight_prefix $(date)" >> "$LOG"
LVR_HETERO_7B=1 LVR_SERVE_MODE=inflight_prefix LVR_HETERO_N=200 \
  LVR_HETERO_SEEDS=17,43,91 timeout 7200 \
  python benchmarks/run_all.py --only serve_hetero >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue8 done $(date)" >> "$LOG"
