#!/bin/bash
# R5K: the round-5 headline end-metric run — a FRESH one-command
# multichannel rehearsal with every round-5 improvement active by
# default: bf16 recipe numerics (= the bench config), reverb-matched CTC
# recognizer training, q98/pad8/2x-gap standalone TS-SEP diarization,
# plateau-center threshold calibration with the densified grid.
# Direct comparisons: TPU_R4I (f32, dry CTC, mean-stat) and TPU_R5C
# (bf16, dry CTC, mean-stat).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5K_RESULTS.txt
echo "R5K final rehearsal $(date)" > "$OUT"
echo "defaults: bf16 recipe numerics, reverb-matched CTC, q98/pad8/2xgap" >> "$OUT"
timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
  --vocabulary=8 egs/simulated_mc_r5 >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
