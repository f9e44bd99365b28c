#!/bin/bash
# Round-4 queue 5: int4 kernel v2 on-chip re-measure.
#  1. probe_int4.py — GB/s canary (fused-in-VMEM unpack vs materialized).
#  2. decode7b int4 b4 / b8 official rows.
cd "$(dirname "$0")/.."
set -x
timeout 1800 python benchmarks/probe_int4.py
LVR_DECODE_QUANT=int4 LVR_DECODE_B=4 timeout 3000 python benchmarks/run_all.py --only decode7b
LVR_DECODE_QUANT=int4 LVR_DECODE_B=8 timeout 3000 python benchmarks/run_all.py --only decode7b
