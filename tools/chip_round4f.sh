#!/bin/bash
# Round-4 chip program, part 6: segment-wise WER re-eval (the recognizer
# decodes diarized segments, not whole streams) + q90 activity statistic
# comparison for the word corpus.
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4F_RESULTS.txt
echo "start $(date)" > "$OUT"

echo "=== re-eval simulated_mc_v, segment-wise WER (mean statistic)" >> "$OUT"
timeout 3600 python tools/reeval_mc.py egs/simulated_mc_v _r3 >> "$OUT" 2>&1

echo "=== re-eval simulated_mc_v, q90 activity statistic" >> "$OUT"
TSSEP_EVAL_ACTIVITY=q90 timeout 3600 python tools/reeval_mc.py \
  egs/simulated_mc_v _q90 >> "$OUT" 2>&1

echo "=== re-eval simulated_mc (continuous), q90 activity statistic" >> "$OUT"
TSSEP_EVAL_ACTIVITY=q90 timeout 3600 python tools/reeval_mc.py \
  egs/simulated_mc _q90 >> "$OUT" 2>&1

echo "=== done $(date)" >> "$OUT"
