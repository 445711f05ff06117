#!/bin/bash
# Poll for the axon relay; when it answers, run the round-4 on-chip program
# SERIALIZED (racing jobs jam the relay's compile queue — round-4 lesson).
# Results land in /root/repo/TPU_RETURN_RESULTS.txt.
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_RETURN_RESULTS.txt
for i in $(seq 1 1000); do
  if timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/8083" 2>/dev/null; then
    echo "tunnel up at $(date)" | tee "$OUT"
    # quick real probe: can jax actually run?
    if timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(4))))" >>"$OUT" 2>&1; then
      echo "=== check_bidi (BIDI, LAYER_VJP, FULLFUSE, CONDFUSE, SPILL numerics)" >> "$OUT"
      timeout 2400 python tools/check_bidi.py >> "$OUT" 2>&1
      echo "=== bench default (regression vs 2280)" >> "$OUT"
      timeout 1200 python bench.py >> "$OUT" 2>&1
      echo "=== bench SPILL" >> "$OUT"
      TSSEP_PALLAS_SPILL=1 timeout 1800 python bench.py >> "$OUT" 2>&1
      echo "=== layer bench SPILL (fwd vs fwd+bwd)" >> "$OUT"
      TSSEP_PALLAS_SPILL=1 timeout 1800 python tools/bench_layer.py >> "$OUT" 2>&1
      echo "=== bench --infer" >> "$OUT"
      timeout 1200 python bench.py --infer >> "$OUT" 2>&1
      echo "=== multichannel rehearsal (chip scale, closed pool, vocabulary)" >> "$OUT"
      timeout 10800 python -m tssep_tpu.exp.run_simulated --multichannel \
        >> "$OUT" 2>&1
      echo "=== done $(date)" >> "$OUT"
      exit 0
    else
      echo "port open but jax probe failed; keep waiting" >> "$OUT"
    fi
  fi
  sleep 60
done
echo "gave up waiting for tunnel" > "$OUT"
exit 1
