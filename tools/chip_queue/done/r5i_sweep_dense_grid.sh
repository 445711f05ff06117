#!/bin/bash
# R5I: re-run the activity sweep with the densified low-end threshold grid
# (0.003/0.005/0.007 added) so the calibrated threshold can land interior:
# R5F's winner (q98, gap 58, pad 8, eval DER 0.1251) still pinned to the
# old 0.01 grid floor while falarm stayed ~0 — the optimum was below it.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5I_RESULTS.txt
echo "R5I dense-grid activity sweep $(date)" > "$OUT"
timeout 5400 python tools/sweep_activity.py egs/simulated_mc_bf16 \
  >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
