#!/bin/bash
# Round-4 chip program, part 4: re-score both trained rehearsals with the
# fixed activity statistic + gap-merged diarization + CTC transcriber on
# both the masking and MVDR paths.
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4D_RESULTS.txt
echo "start $(date)" > "$OUT"

echo "=== re-eval simulated_mc (continuous speech)" >> "$OUT"
timeout 3600 python tools/reeval_mc.py egs/simulated_mc _r2 >> "$OUT" 2>&1

echo "=== re-eval simulated_mc_v (word vocabulary, cpWER both paths)" >> "$OUT"
timeout 3600 python tools/reeval_mc.py egs/simulated_mc_v _r2 >> "$OUT" 2>&1

echo "=== done $(date)" >> "$OUT"
