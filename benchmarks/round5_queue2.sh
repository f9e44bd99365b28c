#!/bin/bash
# Round-5 queue 2 (VERDICT r4 #1): vicuna-7B QLoRA training on the real
# chip — stage-2 (LoRA r128 + projector) and stage-1 (projector-only)
# over the int4 frozen base, plus the remat_policy=dots variant (may
# legitimately OOM at 7B; the bench records that outcome).
set -u
cd /root/repo
LOG=/tmp/round5_queue2.log
echo "=== round5_queue2 start $(date)" >> "$LOG"

for spec in "2 block" "1 block" "2 dots"; do
  set -- $spec
  echo "--- train7b stage=$1 remat=$2 $(date)" >> "$LOG"
  LVR_TRAIN7B_STAGE="$1" LVR_TRAIN_REMAT_POLICY="$2" timeout 5400 \
    python benchmarks/run_all.py --only train7b >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 30
done

echo "=== round5_queue2 done $(date)" >> "$LOG"
