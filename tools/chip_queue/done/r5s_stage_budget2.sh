#!/bin/bash
# R5S: stage-budget rerun AFTER the power-chain gen optimization — the
# R5J ladder predates it; this gives the final committed per-stage budget
# at the ~3,150 audio-s/s default.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5S_RESULTS.txt
echo "R5S stage budget (post gen-opt) $(date)" > "$OUT"
timeout 3600 python bench.py --stage-budget --steps=20 >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
