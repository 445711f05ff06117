#!/bin/bash
# Poll for the axon relay; when it answers, run the on-chip kernel checks
# and the bench grid. Results land in /tmp/tpu_return_results.txt.
cd "$(dirname "$0")/.."
OUT=/root/repo/TPU_RETURN_RESULTS.txt
for i in $(seq 1 1000); do
  if timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/8083" 2>/dev/null; then
    echo "tunnel up at $(date)" | tee "$OUT"
    # quick real probe: can jax actually run?
    if timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(4))))" >>"$OUT" 2>&1; then
      echo "=== check_bidi (BIDI, LAYER_VJP, FULLFUSE, CONDFUSE numerics)" >> "$OUT"
      timeout 1800 python tools/check_bidi.py >> "$OUT" 2>&1
      echo "=== bench grid" >> "$OUT"
      timeout 7200 bash tools/bench_configs.sh >> "$OUT" 2>&1
      echo "=== profile stages" >> "$OUT"
      timeout 1200 python tools/profile_stages.py >> "$OUT" 2>&1
      echo "=== multichannel rehearsal (chip scale)" >> "$OUT"
      timeout 7200 python -m tssep_tpu.exp.run_simulated --multichannel \
        /tmp/mc_rehearsal >> "$OUT" 2>&1
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
