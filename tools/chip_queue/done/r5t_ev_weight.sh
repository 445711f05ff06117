#!/bin/bash
# R5T: explicit_vad tradeoff point — vad_weight=0.3 (R5Q at 1.0 bought
# standalone DER 0.019 but cost SI-SDR 5.54 -> 4.39 vs the LogMAE-only
# default).  A lighter gate loss should keep the trained-gate diarization
# while restoring separation quality.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5T_RESULTS.txt
echo "R5T explicit_vad vad_weight=0.3 $(date)" > "$OUT"
rm -rf egs/simulated_mc_ev03
timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
  --vocabulary=8 --explicit_vad=1 --vad_weight=0.3 egs/simulated_mc_ev03 \
  >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
