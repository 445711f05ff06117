#!/bin/bash
# Round-5 chip job runner.
#
# Waits for the axon relay (port 8083), then consumes tools/chip_queue/*.sh
# strictly one-at-a-time in lexical order (concurrent compiles jam the relay
# queue — round-4 lesson).  Each queue script owns its results file; finished
# scripts move to tools/chip_queue/done/.  Runs until killed or the queue has
# been idle AND a stop file exists (tools/chip_queue/STOP).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/log/chip_runner_r5.log
Q=/root/repo/tools/chip_queue
mkdir -p "$Q/done" /root/repo/log

echo "runner start $(date)" >> "$LOG"

tunnel_up() { timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/8083" 2>/dev/null; }

probe_ok() {
  timeout 300 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(4))))" \
    >> "$LOG" 2>&1
}

while true; do
  if [ -f "$Q/STOP" ] && [ -z "$(ls "$Q"/*.sh 2>/dev/null)" ]; then
    echo "runner stop (STOP file, empty queue) $(date)" >> "$LOG"
    exit 0
  fi
  next=$(ls "$Q"/*.sh 2>/dev/null | sort | head -1)
  if [ -z "$next" ]; then
    sleep 20
    continue
  fi
  if ! tunnel_up; then
    echo "queue has $(ls "$Q"/*.sh 2>/dev/null | wc -l) jobs; tunnel down $(date)" >> "$LOG"
    sleep 60
    continue
  fi
  if ! probe_ok; then
    echo "port open but probe failed $(date)" >> "$LOG"
    sleep 60
    continue
  fi
  name=$(basename "$next")
  echo "=== running $name $(date)" >> "$LOG"
  bash "$next" >> "$LOG" 2>&1
  rc=$?
  echo "=== done $name rc=$rc $(date)" >> "$LOG"
  mv "$next" "$Q/done/$name"
done
