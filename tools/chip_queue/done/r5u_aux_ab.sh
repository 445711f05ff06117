#!/bin/bash
# R5U: per-example-loss aux output A/B.  The R5J/R5S stage ladders'
# 'full' steps (scalar-only loss) measured 380/353 ms vs the default
# step's ~405 ms with donation already ruled out (R5L) — if the aux
# output is the cause, the production trainer can emit per-example
# losses only on summary steps.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5U_RESULTS.txt
echo "R5U aux A/B $(date)" > "$OUT"
echo "=== A: default (has_aux per-example loss)" >> "$OUT"
timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== B: TSSEP_BENCH_NO_AUX=1 (scalar-only)" >> "$OUT"
TSSEP_BENCH_NO_AUX=1 timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== A2" >> "$OUT"
timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== B2" >> "$OUT"
TSSEP_BENCH_NO_AUX=1 timeout 1800 python bench.py >> "$OUT" 2>&1
echo "done $(date)" >> "$OUT"
