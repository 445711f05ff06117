#!/bin/bash
# Round-4 chip program, part 11: batch-384 attempts with lighter-memory
# configs (bf16 dx/dhs streaming + piecewise ISTFT freed HBM; batch 384
# at NRF=2 measured 22.8 G vs 15.75 G before those changes).
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4K_RESULTS.txt
echo "start $(date)" > "$OUT"
echo "=== batch 384, NRF=2 (retry after bf16 dx/dhs)" >> "$OUT"
timeout 1500 python bench.py --batch 384 >> "$OUT" 2>&1
echo "=== batch 384, NRF=1" >> "$OUT"
TSSEP_NO_REMAT_FOLDED=1 timeout 1500 python bench.py --batch 384 >> "$OUT" 2>&1
echo "=== batch 384, NRF=0 (full remat)" >> "$OUT"
TSSEP_NO_REMAT_FOLDED=0 timeout 1500 python bench.py --batch 384 >> "$OUT" 2>&1
echo "=== batch 320, NRF=2" >> "$OUT"
timeout 1500 python bench.py --batch 320 >> "$OUT" 2>&1
echo "=== done $(date)" >> "$OUT"
