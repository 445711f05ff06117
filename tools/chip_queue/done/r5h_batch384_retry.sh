#!/bin/bash
# R5H: batch-384 bench retry.  R5B's batch-384 attempts died in the remote
# compile helper (HTTP 500 + TPU_WORKER_HOSTNAMES warnings — infra-shaped,
# not an XLA OOM traceback).  Retry both NRF settings once, then a batch
# 448 probe to map the post-no-flip throughput curve.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/TPU_R5H_RESULTS.txt
echo "R5H batch sweep $(date)" > "$OUT"

echo "=== bench batch 384 NRF=2 (retry after R5B infra 500)" >> "$OUT"
TSSEP_NO_REMAT_FOLDED=2 timeout 1800 python bench.py --batch 384 >> "$OUT" 2>&1
echo "rc=$?" >> "$OUT"

echo "=== bench batch 384 NRF=3" >> "$OUT"
TSSEP_NO_REMAT_FOLDED=3 timeout 1800 python bench.py --batch 384 >> "$OUT" 2>&1
echo "rc=$?" >> "$OUT"

echo "=== bench batch 448 NRF=2" >> "$OUT"
TSSEP_NO_REMAT_FOLDED=2 timeout 1800 python bench.py --batch 448 >> "$OUT" 2>&1
echo "rc=$?" >> "$OUT"

echo "done $(date)" >> "$OUT"
