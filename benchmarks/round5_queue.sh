#!/bin/bash
# Round-5 queue 1 (VERDICT r4 #4, #5): OpenCLIP-L zoo rows (exact /
# expclamp_fused / fast-act) + SigLIP official-row refresh.
# One TPU process at a time; one measurement per process (CLAUDE.md:
# remote compile latency is variable — budget generously).
set -u
cd /root/repo
LOG=/tmp/round5_queue.log
echo "=== round5_queue start $(date)" >> "$LOG"

echo "--- openclip exact $(date)" >> "$LOG"
LVR_TOWER_NAMES=laion timeout 3000 \
  python benchmarks/run_all.py --only towers >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- openclip expclamp_fused $(date)" >> "$LOG"
LVR_TOWER_NAMES=laion LVR_TOWER_ATTN=xla_expclamp_fused timeout 3000 \
  python benchmarks/run_all.py --only towers >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- openclip expclamp_fused + fast-act $(date)" >> "$LOG"
LVR_TOWER_NAMES=laion LVR_TOWER_ATTN=xla_expclamp_fused \
  LVR_TOWER_ACT=gelu_tanh timeout 3000 \
  python benchmarks/run_all.py --only towers >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
sleep 20

echo "--- siglip expclamp_fused refresh $(date)" >> "$LOG"
LVR_TOWER_NAMES=siglip LVR_TOWER_ATTN=xla_expclamp_fused timeout 3000 \
  python benchmarks/run_all.py --only towers >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== round5_queue done $(date)" >> "$LOG"
