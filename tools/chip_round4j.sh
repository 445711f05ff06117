#!/bin/bash
# Round-4 chip program, part 10: re-verify kernel numerics + bench after
# the storage-dtype dx/dhs streaming changes (cast-before-transpose,
# bf16 dx outputs + dhs inputs on the fullfuse/spill backwards).
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4J_RESULTS.txt
echo "start $(date)" > "$OUT"
echo "=== check_bidi (all kernels, bf16 storage)" >> "$OUT"
timeout 2400 python tools/check_bidi.py >> "$OUT" 2>&1
echo "=== bench default" >> "$OUT"
timeout 1500 python bench.py >> "$OUT" 2>&1
echo "=== bench --infer" >> "$OUT"
timeout 1500 python bench.py --infer >> "$OUT" 2>&1
echo "=== done $(date)" >> "$OUT"
