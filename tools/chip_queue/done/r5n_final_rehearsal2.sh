#!/bin/bash
# R5N: final rehearsal retry.  R5K's TS-VAD sat on the 8-speaker
# conditioning plateau (validation BCE flat at ~0.515 through 800 iters;
# R5C's escape happened at ~480-560 — the onset varies with the RNG
# stream, which the round-5 per-example-key refactor legitimately
# changed).  tsvad_iters now defaults to 1600 and the recipe fails loudly
# right after stage 1 if the plateau was never escaped.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5N_RESULTS.txt
echo "R5N final rehearsal (tsvad_iters=1600) $(date)" > "$OUT"
rm -rf egs/simulated_mc_r5b
timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
  --vocabulary=8 egs/simulated_mc_r5b >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
