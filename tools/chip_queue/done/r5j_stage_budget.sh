#!/bin/bash
# R5J: per-stage time attribution of the default train step (verdict weak
# #9: ~176 ms residual unattributed).  bench.py --stage-budget measures a
# ladder of truncated steps (loss attached at successively later points;
# XLA DCEs downstream) — the deltas attribute the full 443 ms budget:
# input pipeline / STFT+features / pre_net / birnn0/1/2 / final linear /
# head transpose / trials+revert+sigmoid / masked synthesis / ISTFT+loss.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5J_RESULTS.txt
echo "R5J stage budget $(date)" > "$OUT"
timeout 3600 python bench.py --stage-budget --steps=20 >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
