#!/bin/bash
# R5D: activity-statistic sweep (stat x merge_gap x threshold) for
# standalone TS-SEP diarization, on the R5C rehearsal's checkpoints.
# Verdict round-4 weak #1: freq-mean calibrates to the grid edge.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5D_RESULTS.txt
echo "R5D activity sweep $(date)" > "$OUT"
if [ ! -f egs/simulated_mc_bf16/tssep/config.yaml ]; then
  echo "R5C artifacts missing; skipping" >> "$OUT"
  exit 0
fi
timeout 5400 python tools/sweep_activity.py egs/simulated_mc_bf16 >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
