#!/bin/bash
# R5B: chip-verify the no-flip fullfused kernels (in-kernel time reversal)
# and re-run the batch ladder the rev/remat_compressed allocations OOM'd
# (TPU_R4K/L post-mortem): batch 320/384 at NRF=2 should now fit.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5B_RESULTS.txt
echo "R5B no-flip kernels $(date)" > "$OUT"

echo "=== check_bidi (numerics, all kernel variants, odd T -> pad path)" >> "$OUT"
timeout 1800 python tools/check_bidi.py >> "$OUT" 2>&1
echo "rc=$?" >> "$OUT"

echo "=== bench batch 256 default (no-flip; expect >= 2888)" >> "$OUT"
timeout 1800 python bench.py >> "$OUT" 2>&1

echo "=== bench batch 320 NRF=2 (was OOM by 431 MB pre-no-flip)" >> "$OUT"
TSSEP_NO_REMAT_FOLDED=2 timeout 1800 python bench.py --batch 320 >> "$OUT" 2>&1

echo "=== bench batch 384 NRF=2 (was OOM 18.7 G)" >> "$OUT"
TSSEP_NO_REMAT_FOLDED=2 timeout 1800 python bench.py --batch 384 >> "$OUT" 2>&1

echo "=== bench batch 384 NRF=3" >> "$OUT"
TSSEP_NO_REMAT_FOLDED=3 timeout 1800 python bench.py --batch 384 >> "$OUT" 2>&1

echo "=== done $(date)" >> "$OUT"
