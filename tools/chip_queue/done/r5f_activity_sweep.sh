#!/bin/bash
# R5F: full activity-statistic sweep (stat x merge_gap x pad x threshold)
# on the R5C bf16 rehearsal artifacts — verdict round-4 weak #1.  The
# dilation + plateau-center calibration landed in commit ba7ccb7; this run
# produces the committed full-corpus numbers (4 cal + 4 eval recordings).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5F_RESULTS.txt
echo "R5F activity sweep $(date)" > "$OUT"
if [ ! -f egs/simulated_mc_bf16/tssep/config.yaml ]; then
  echo "R5C artifacts missing; skipping" >> "$OUT"
  exit 0
fi
timeout 5400 python tools/sweep_activity.py egs/simulated_mc_bf16 \
  >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
