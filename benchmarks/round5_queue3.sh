#!/bin/bash
# Round-5 queue 3 (VERDICT r4 #6): int8 KV-cache decode rows at 7B.
# b16 and b8 with int8 weights + int8 KV cache — compare the committed
# _int8 rows (385.4 b16 / 314.1 b8): the KV read is the term the
# round-4 roofline identified as the b8+ bottleneck.
set -u
cd /root/repo
LOG=/tmp/round5_queue3.log
echo "=== round5_queue3 start $(date)" >> "$LOG"

# chunk matches each baseline row (b16 was chunk=8, b8 chunk=16)
for spec in "16 8" "8 16"; do
  set -- $spec
  echo "--- decode7b int8+kv8 b=$1 chunk=$2 $(date)" >> "$LOG"
  LVR_DECODE_B="$1" LVR_DECODE_QUANT=int8 LVR_KV_QUANT=int8 \
    LVR_DECODE_CHUNK="$2" timeout 5400 \
    python benchmarks/run_all.py --only decode7b >> "$LOG" 2>&1
  echo "rc=$? $(date)" >> "$LOG"
  sleep 30
done

echo "=== round5_queue3 done $(date)" >> "$LOG"
