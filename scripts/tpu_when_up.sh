#!/bin/bash
# Wait for the axon tunnel to answer a tiny op, then run the TPU smoke and
# the headline bench config. Logs to /tmp/tpu_when_up.log.
log=/tmp/tpu_when_up.log
: > "$log"
for i in $(seq 1 90); do
  if timeout 60 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,128)).sum()))" >> "$log" 2>&1; then
    echo "tunnel up after attempt $i $(date +%H:%M:%S)" >> "$log"
    break
  fi
  echo "attempt $i: tunnel down $(date +%H:%M:%S)" >> "$log"
  sleep 20
done
echo "=== tpu_smoke ===" >> "$log"
timeout 570 python scripts/tpu_smoke.py >> "$log" 2>&1
echo "=== bench config 2 ===" >> "$log"
timeout 570 python bench.py >> "$log" 2>&1
echo "=== done $(date +%H:%M:%S) ===" >> "$log"
