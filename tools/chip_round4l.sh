#!/bin/bash
# Round-4 chip program, part 12: bench the fused masked-synthesis path
# (re/im straight into the ISTFT) + batch 320 retry (the freed complex
# intermediate may cover the 431 MB shortfall).
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4L_RESULTS.txt
echo "start $(date)" > "$OUT"
echo "=== bench default (re_im fusion)" >> "$OUT"
timeout 1500 python bench.py >> "$OUT" 2>&1
echo "=== bench default repeat" >> "$OUT"
timeout 1500 python bench.py >> "$OUT" 2>&1
echo "=== batch 320, NRF=2 (retry: complex intermediate freed)" >> "$OUT"
timeout 1500 python bench.py --batch 320 >> "$OUT" 2>&1
echo "=== done $(date)" >> "$OUT"
