#!/bin/bash
# Round-4 chip program, part 9: the definitive one-command rehearsal —
# fresh corpus + both stages + joint evals + masking/MVDR/MVDR+postmask
# comparison + end-to-end cpWER, all from the shipped recipe.
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4I_RESULTS.txt
echo "start $(date)" > "$OUT"
timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
  --vocabulary=8 egs/simulated_mc_final >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
