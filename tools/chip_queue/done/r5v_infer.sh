#!/bin/bash
# R5V: refresh the inference headline — the power-chain gen optimization
# (R5L/M: +6.3% on train) also feeds the infer bench's on-device batches
# (R5A's 5,007 predates it).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5V_RESULTS.txt
echo "R5V infer refresh $(date)" > "$OUT"
timeout 1800 python bench.py --infer >> "$OUT" 2>&1
echo "rc=$?" >> "$OUT"
timeout 1800 python bench.py --infer >> "$OUT" 2>&1
echo "rc=$? done $(date)" >> "$OUT"
