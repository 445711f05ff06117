#!/bin/bash
# R5A: reconfirm the round-4 default on the chip (regression gate for the
# round-5 perf program) + kernel numerics sanity.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5A_RESULTS.txt
echo "R5A baseline $(date)" > "$OUT"
echo "=== bench default (expect ~2888 audio-s/s)" >> "$OUT"
timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== bench --infer" >> "$OUT"
timeout 1200 python bench.py --infer >> "$OUT" 2>&1
echo "=== done $(date)" >> "$OUT"
