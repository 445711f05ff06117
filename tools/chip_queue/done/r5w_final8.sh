#!/bin/bash
# R5W: the definitive round-5 record — the new default recipe (joint
# head, vad_weight 0.3) with DOUBLE the eval set (8 recordings x 32
# words) to tighten the cpWER/SI-SDR statistics the round-4 verdict
# called fragile at n=4.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5W_RESULTS.txt
echo "R5W final record (default recipe, eval_examples=8) $(date)" > "$OUT"
rm -rf egs/simulated_mc_r5w
timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
  --vocabulary=8 --eval_examples=8 egs/simulated_mc_r5w >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
