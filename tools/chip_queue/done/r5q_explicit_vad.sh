#!/bin/bash
# R5Q: full rehearsal with --explicit_vad=1 — the reference's joint head
# (TS-SEP channel 0 = BCE-trained activity gate, SignalAndVADSigmoidBCE).
# Standalone TS-SEP then diarizes from a TRAINED gate instead of mask
# statistics; expected to close the remaining standalone-DER gap
# (mask-stat best: 0.119 on R5C's model / 0.231 on R5N's).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5Q_RESULTS.txt
echo "R5Q explicit_vad rehearsal $(date)" > "$OUT"
rm -rf egs/simulated_mc_ev
timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
  --vocabulary=8 --explicit_vad=1 egs/simulated_mc_ev >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
