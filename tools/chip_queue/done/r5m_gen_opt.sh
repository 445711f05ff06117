#!/bin/bash
# R5M: measure the device-sim power-chain optimization (8x fewer
# transcendentals in the harmonic bank, commit after R5J attributed a
# large 'gen' share to the input pipeline).  Default bench + the first
# three ladder stages for the gen/feat deltas.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5M_RESULTS.txt
echo "R5M gen optimization $(date)" > "$OUT"
echo "=== bench default (donate; pre-change ref: 2968 @ R5B)" >> "$OUT"
timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== bench TSSEP_BENCH_DONATE=0" >> "$OUT"
TSSEP_BENCH_DONATE=0 timeout 1800 python bench.py >> "$OUT" 2>&1
echo "done $(date)" >> "$OUT"
