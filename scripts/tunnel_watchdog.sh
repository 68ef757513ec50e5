#!/bin/bash
# Wait for the TPU tunnel to recover, then resume the Phase-B ladder.
set -u
LOG=/tmp/watchdog.log
echo "watchdog start $(date)" >> "$LOG"
while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float(jnp.sum(x @ x)) > 0
" >/dev/null 2>&1; then
    echo "tunnel recovered $(date)" >> "$LOG"
    break
  fi
  echo "tunnel still down $(date)" >> "$LOG"
  sleep 120
done
N_CHUNKS=${N_CHUNKS:-2} bash scripts/run_qa_lm_phaseB.sh
echo "ladder finished $(date)" >> "$LOG"
