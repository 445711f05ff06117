#!/bin/bash
# Round-4 chip bench grid, part 3 (run after chip_round4b.sh finishes):
# the piece-wise ISTFT freed ~5-6 GB of peak HBM, which reopens configs
# that OOM'd in round 3; and the all-layers-no-remat SPILL run measured
# 1796 (a scheduler cliff, same signature as NO_REMAT_FOLDED=1 -> 1758),
# so try spill only on the currently-no-remat layers.
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4C_RESULTS.txt
echo "start $(date)" > "$OUT"

run() {
  echo "=== $1" >> "$OUT"
  shift
  env "$@" timeout 1500 python bench.py >> "$OUT" 2>&1
}

run "spill honoring remat (NO_REMAT_FOLDED=2 default)" \
    TSSEP_PALLAS_SPILL=1 TSSEP_PALLAS_SPILL_REMAT=1
run "fullfuse NO_REMAT_FOLDED=3 (r3 OOM; retry with piecewise ISTFT)" \
    TSSEP_NO_REMAT_FOLDED=3
run "LAYER_VJP everywhere (r3 OOM; retry with piecewise ISTFT)" \
    TSSEP_PALLAS_LAYER_VJP=1
run "spill SPILL_BLOCK=16" \
    TSSEP_PALLAS_SPILL=1 TSSEP_PALLAS_SPILL_BLOCK=16
echo "=== default batch 384 (freed HBM -> bigger batch)" >> "$OUT"
timeout 1500 python bench.py --batch 384 >> "$OUT" 2>&1
echo "=== default batch 512" >> "$OUT"
timeout 1500 python bench.py --batch 512 >> "$OUT" 2>&1

echo "=== done $(date)" >> "$OUT"
