#!/bin/bash
# Round-4 phase 3: train remat-policy sweep on the final guard
# (select-zero) + decomposition probe + sustained-BW probe.
set -u
cd /root/repo
LOG=/tmp/round4_queue3.log
echo "=== round4_queue3 start $(date)" >> "$LOG"

echo "--- train dots $(date)" >> "$LOG"
LVR_TRAIN_REMAT_POLICY=dots timeout 5400 \
  python benchmarks/run_all.py --only train >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- train none accum2 $(date)" >> "$LOG"
LVR_TRAIN_REMAT_POLICY=none LVR_TRAIN_ACCUM=2 timeout 5400 \
  python benchmarks/run_all.py --only train >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- probe_train_decomp (dots) $(date)" >> "$LOG"
LVR_TRAIN_REMAT_POLICY=dots timeout 3600 \
  python benchmarks/probe_train_decomp.py >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- probe_decode_bw $(date)" >> "$LOG"
timeout 1800 python benchmarks/probe_decode_bw.py >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
echo "=== round4_queue3 done $(date)" >> "$LOG"
