#!/bin/bash
# Round-4 chip program, part 8: MVDR + mask post-filter (the reference's
# enhancer masking option) in the joint deployment, + confirm the new
# bench default (bf16 head) reproduces.
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4H_RESULTS.txt
echo "start $(date)" > "$OUT"

echo "=== bench default (now incl. TSSEP_HEAD_BF16)" >> "$OUT"
timeout 1500 python bench.py >> "$OUT" 2>&1

echo "=== joint MVDR+postmask eps=0.3, simulated_mc (continuous)" >> "$OUT"
TSSEP_REEVAL_JOINT=1 TSSEP_REEVAL_POSTMASK=0.3 timeout 3600 \
  python tools/reeval_mc.py egs/simulated_mc _pm03 >> "$OUT" 2>&1

echo "=== joint MVDR+postmask eps=0.3, simulated_mc_v (words, cpWER)" >> "$OUT"
TSSEP_REEVAL_JOINT=1 TSSEP_REEVAL_POSTMASK=0.3 timeout 3600 \
  python tools/reeval_mc.py egs/simulated_mc_v _pm03 >> "$OUT" 2>&1

echo "=== joint MVDR+postmask eps=0.1, simulated_mc_v" >> "$OUT"
TSSEP_REEVAL_JOINT=1 TSSEP_REEVAL_POSTMASK=0.1 timeout 3600 \
  python tools/reeval_mc.py egs/simulated_mc_v _pm01 >> "$OUT" 2>&1

echo "=== done $(date)" >> "$OUT"
