#!/bin/bash
# Round-4 chip program, part 2 (serialized; racing jobs jam the relay's
# compile queue): spill bench with the VMEM fix, rehearsal re-eval with
# the fixed activity statistic, vocabulary rehearsal (end-to-end WER).
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4B_RESULTS.txt
echo "start $(date)" > "$OUT"

echo "=== bench SPILL (adaptive bwd bb, no-remat spill)" >> "$OUT"
TSSEP_PALLAS_SPILL=1 timeout 1800 python bench.py >> "$OUT" 2>&1

echo "=== layer bench SPILL" >> "$OUT"
TSSEP_PALLAS_SPILL=1 timeout 1800 python tools/bench_layer.py >> "$OUT" 2>&1

echo "=== rehearsal re-eval (fixed activity statistic, same checkpoints)" >> "$OUT"
timeout 3600 python tools/reeval_mc.py >> "$OUT" 2>&1

echo "=== vocabulary rehearsal (end-to-end cpWER with the CTC recognizer)" >> "$OUT"
timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
  --vocabulary=8 egs/simulated_mc_v >> "$OUT" 2>&1

echo "=== done $(date)" >> "$OUT"
