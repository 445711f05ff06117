#!/bin/bash
# R5R: refresh the folded-layer roofline numbers backing PERF.md's
# composite budget ("77% of latency-aware roofline" is a round-3 figure;
# re-measure on the current no-flip kernels at birnn0/birnn1 dims).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5R_RESULTS.txt
echo "R5R layer roofline refresh $(date)" > "$OUT"
for dims in "2048 316 513 300" "2048 316 320 300"; do
  set -- $dims
  echo "=== B=$1 T=$2 I=$3 H=$4 (fullfuse default)" >> "$OUT"
  LAYERB_B=$1 LAYERB_T=$2 LAYERB_I=$3 LAYERB_H=$4 \
    TSSEP_PALLAS_FULLFUSE=1 TSSEP_PALLAS_BATCH_BLOCK=256 \
    timeout 1200 python tools/bench_layer.py >> "$OUT" 2>&1
done
echo "done $(date)" >> "$OUT"
