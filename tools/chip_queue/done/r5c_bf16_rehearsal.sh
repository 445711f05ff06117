#!/bin/bash
# R5C: the full multichannel rehearsal under the BENCH numerics
# (TSSEP_COMPUTE_DTYPE=bfloat16 TSSEP_HEAD_BF16=1) — round-4 verdict: the
# headline perf number and the headline end-metric numbers came from
# different numerics.  Same seeds as TPU_R4I (same corpus), so the f32
# record in TPU_R4I_RESULTS.txt is the direct comparison.  The storage dir
# is kept: R5D (activity-stat sweep) and R5E (cpWER diagnosis) reuse its
# checkpoints, shards and CTC model.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export TSSEP_COMPUTE_DTYPE=bfloat16
export TSSEP_HEAD_BF16=1
OUT=/root/repo/TPU_R5C_RESULTS.txt
echo "R5C bf16 rehearsal $(date)" > "$OUT"
echo "env: TSSEP_COMPUTE_DTYPE=bfloat16 TSSEP_HEAD_BF16=1 (the bench env)" >> "$OUT"
timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
  --vocabulary=8 egs/simulated_mc_bf16 >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
