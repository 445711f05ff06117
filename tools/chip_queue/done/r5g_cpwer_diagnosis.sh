#!/bin/bash
# R5G: three-way cpWER decomposition (recognizer floor / oracle-mask
# front-end class / actual pipeline) on the R5C rehearsal corpus + CTC
# model — verdict round-4 weak #2 (0.67 cpWER undiagnosed).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5G_RESULTS.txt
echo "R5G cpWER diagnosis $(date)" > "$OUT"
if [ ! -f egs/simulated_mc_bf16/ctc_asr.npz ]; then
  echo "R5C artifacts missing; skipping" >> "$OUT"
  exit 0
fi
timeout 3600 python tools/diagnose_cpwer.py egs/simulated_mc_bf16 \
  >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
