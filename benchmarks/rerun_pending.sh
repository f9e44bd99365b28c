#!/bin/bash
# Round-3 pending re-measures (benchmarks/README.md "pending re-measures"):
# per-family diffusion fast-attn rows + the serve inflight/wave pair.
# One TPU process at a time; one family per process (CLAUDE.md: remote
# compile latency is variable — prefer one measurement per process).
set -u
cd /root/repo
LOG=/tmp/rerun_pending.log
echo "=== rerun_pending start $(date)" >> "$LOG"
for fam in stable-diffusion-v1-5 stable-diffusion-xl-base-1.0 DiT-XL-2-512 stable-diffusion-3-medium-diffusers; do
  echo "--- family $fam $(date)" >> "$LOG"
  LVR_BENCH_FAMILY="$fam" timeout 3000 python benchmarks/run_all.py --only diffusion >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
done
echo "--- serve inflight $(date)" >> "$LOG"
LVR_SERVE_INFLIGHT=1 timeout 3000 python benchmarks/run_all.py --only serve >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"
echo "=== rerun_pending done $(date)" >> "$LOG"
