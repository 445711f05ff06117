#!/bin/bash
# R5O: kernel block-size micro-sweep at the new ~3150 baseline — the
# gen-optimization shifted the step's memory/schedule balance, so re-check
# the Pallas batch/time block choices (defaults 256/4).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5O_RESULTS.txt
echo "R5O block sweep $(date)" > "$OUT"
for cfg in "256 4" "256 8" "512 4" "128 4"; do
  set -- $cfg
  echo "=== BATCH_BLOCK=$1 TIME_BLOCK=$2" >> "$OUT"
  TSSEP_PALLAS_BATCH_BLOCK=$1 TSSEP_PALLAS_TIME_BLOCK=$2 \
    timeout 1800 python bench.py >> "$OUT" 2>&1
done
echo "done $(date)" >> "$OUT"
