#!/bin/bash
# R5P: ISTFT formulation A/B at the new baseline.  The piecewise windowed
# ISTFT (8 small matmuls, no (B,S,T,window) intermediate) was the round-4
# memory winner; the stage budget attributes ~44 ms to ISTFT+loss.  The
# fallback path (2 big matmuls + one overlap-add, materializes a 1.3 GB
# bf16 segs tensor) may now fit AND schedule better post-no-flip.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5P_RESULTS.txt
echo "R5P istft A/B $(date)" > "$OUT"
echo "=== A: piecewise (default)" >> "$OUT"
timeout 1800 python bench.py >> "$OUT" 2>&1
echo "=== B: TSSEP_ISTFT_PIECEWISE=0 (segs matmul + overlap-add)" >> "$OUT"
TSSEP_ISTFT_PIECEWISE=0 timeout 1800 python bench.py >> "$OUT" 2>&1
echo "done $(date)" >> "$OUT"
