#!/bin/bash
# Round-4 follow-up TPU queue (one process at a time on the tunnel):
#  1. dots-remat train sweep with the fused+donated optimizer (the
#     block-policy default run precedes this queue) — the stage-2 MFU
#     lever now that the opt pass is 25 ms.
#  2. int4 weight-only decode rows (packed nibbles, ~3.7 GB resident)
#     at b4/b8 — the next halving of the decode param-read floor.
cd "$(dirname "$0")/.."
set -x
LVR_TRAIN_REMAT_POLICY=dots python benchmarks/run_all.py --only train
LVR_DECODE_QUANT=int4 LVR_DECODE_B=4 python benchmarks/run_all.py --only decode7b
LVR_DECODE_QUANT=int4 LVR_DECODE_B=8 python benchmarks/run_all.py --only decode7b
