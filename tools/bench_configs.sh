#!/bin/bash
# End-to-end bench.py comparison across kernel configurations.
# Per-config stderr lands in /tmp/bench_cfg_<n>.log; OOM/fail is reported.
# Round-3 chip results (fresh-batch bench, batch 256, audio-s/s):
#   BIDI bb=128            2052
#   FULLFUSE bb=128        2169   (remat honored; without remat: HBM OOM)
#   FULLFUSE bb=256        2215
#   FULLFUSE bb=512        2178
#   FULLFUSE + NOREMAT=2   2314   <- default since round 3
#   FULLFUSE + CONDFUSE    2142   (opt-in; loses to the XLA-materialized
#                                  conditioning on v5e)
#   LAYER_VJP everywhere   HBM OOM (20.7G) — opt-in only
cd "$(dirname "$0")/.."
n=0
for cfg in \
  "TSSEP_DEFAULTS=1" \
  "TSSEP_NO_REMAT_FOLDED=0" \
  "TSSEP_NO_REMAT_FOLDED=1" \
  "TSSEP_PALLAS_FULLFUSE=0 TSSEP_NO_REMAT_FOLDED=0 TSSEP_PALLAS_BATCH_BLOCK=128" \
  "TSSEP_PALLAS_BATCH_BLOCK=128" \
  "TSSEP_PALLAS_BATCH_BLOCK=512" \
  "TSSEP_PALLAS_CONDFUSE=1" \
  "TSSEP_PALLAS_CONDFUSE=1 TSSEP_PALLAS_BATCH_BLOCK=512" \
  "TSSEP_PALLAS_BWD_BF16=1" \
  "TSSEP_PALLAS_TIME_BLOCK=8" \
  ; do
  n=$((n + 1))
  echo "=== $cfg"
  log=/tmp/bench_cfg_$n.log
  if env $cfg timeout 900 python bench.py 2>"$log" | tail -1 | grep .; then
    :
  elif grep -q "Ran out of memory" "$log"; then
    grep -m1 -o "Used [0-9.]*G of [0-9.]*G hbm" "$log" | sed 's/^/    OOM: /'
  else
    echo "    FAILED (see $log): $(grep -m1 -E 'Error|error' "$log" | head -c 160)"
  fi
done
