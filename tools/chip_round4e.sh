#!/bin/bash
# Round-4 chip program, part 5: the measured full-step budget (per-layer
# timings at each of the flagship's four BLSTM shapes) + the bf16
# head/loss-path bench (the HLO table shows 7x ~1.3 GB f32 movement ops
# in the mask path; TSSEP_HEAD_BF16 halves them).
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_R4E_RESULTS.txt
echo "start $(date)" > "$OUT"

layer() {
  echo "=== layer $1 (B=$2 I=$3 H=$4)" >> "$OUT"
  LAYERB_B=$2 LAYERB_T=316 LAYERB_I=$3 LAYERB_H=$4 \
    timeout 1500 python tools/bench_layer.py >> "$OUT" 2>&1
}

layer "pre_net"        256  513  300
layer "birnn0(folded)" 2048 513  300
layer "birnn1(folded)" 2048 320  300
layer "birnn2(ts_vad)" 256  2560 300

echo "=== bench TSSEP_HEAD_BF16=1" >> "$OUT"
TSSEP_HEAD_BF16=1 timeout 1500 python bench.py >> "$OUT" 2>&1

echo "=== bench TSSEP_HEAD_BF16=1 batch 384" >> "$OUT"
TSSEP_HEAD_BF16=1 timeout 1500 python bench.py --batch 384 >> "$OUT" 2>&1

echo "=== done $(date)" >> "$OUT"
