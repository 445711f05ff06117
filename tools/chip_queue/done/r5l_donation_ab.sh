#!/bin/bash
# R5L: donation A/B.  The R5J stage ladder's 'full' step (identical math,
# compiled WITHOUT donate_argnums and without the has_aux per-example
# output) ran 380.2 ms vs the donating bench default's ~431 ms (2,968
# audio-s/s).  If no-donation reproduces under the default bench path,
# that is a free +13% — measure A/B/A to rule out relay drift.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5L_RESULTS.txt
echo "R5L donation A/B $(date)" > "$OUT"
echo "=== A: default (donate)" >> "$OUT"
timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== B: TSSEP_BENCH_DONATE=0" >> "$OUT"
TSSEP_BENCH_DONATE=0 timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== A2: default again (drift check)" >> "$OUT"
timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== B2: no-donate again" >> "$OUT"
TSSEP_BENCH_DONATE=0 timeout 1800 python bench.py >> "$OUT" 2>&1
echo "done $(date)" >> "$OUT"
