#!/bin/bash
# Round-4 phase 2: train-step re-measures after the frozen-weight
# stop_gradient + cond-guard optimization (train/train_step.py).
set -u
cd /root/repo
LOG=/tmp/round4_queue2.log
echo "=== round4_queue2 start $(date)" >> "$LOG"

echo "--- train block $(date)" >> "$LOG"
timeout 5400 python benchmarks/run_all.py --only train >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- train dots $(date)" >> "$LOG"
LVR_TRAIN_REMAT_POLICY=dots timeout 5400 \
  python benchmarks/run_all.py --only train >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- train none accum2 $(date)" >> "$LOG"
LVR_TRAIN_REMAT_POLICY=none LVR_TRAIN_ACCUM=2 timeout 5400 \
  python benchmarks/run_all.py --only train >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round4_queue2 done $(date)" >> "$LOG"
