#!/bin/bash
# Round-4 chip program, part 7: the canonical JOINT deployment re-eval —
# TS-VAD diarization (DER ~0.01) + TS-SEP masks, masking vs MVDR, with
# segment-wise cpWER on the word corpus.
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4G_RESULTS.txt
echo "start $(date)" > "$OUT"

echo "=== joint re-eval simulated_mc (continuous)" >> "$OUT"
TSSEP_REEVAL_JOINT=1 timeout 3600 python tools/reeval_mc.py \
  egs/simulated_mc _joint >> "$OUT" 2>&1

echo "=== joint re-eval simulated_mc_v (word vocabulary, cpWER)" >> "$OUT"
TSSEP_REEVAL_JOINT=1 timeout 3600 python tools/reeval_mc.py \
  egs/simulated_mc_v _joint >> "$OUT" 2>&1

echo "=== done $(date)" >> "$OUT"
