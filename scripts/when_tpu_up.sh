#!/bin/bash
# Poll the axon tunnel; when alive, run the full measurement battery.
# Usage: bash scripts/when_tpu_up.sh [outfile]
OUT=${1:-/tmp/tpu_battery.log}
echo "waiting for TPU..." > "$OUT"
for i in $(seq 1 60); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; float((jnp.ones((8,128))@jnp.ones((128,8))).sum())" >/dev/null 2>&1; then
    echo "TPU alive after $i probes" >> "$OUT"
    echo "=== tpu_smoke ===" >> "$OUT"
    timeout 560 python scripts/tpu_smoke.py 2>&1 | grep -v WARNING | tail -8 >> "$OUT"
    echo "=== bench default ===" >> "$OUT"
    timeout 560 python bench.py 2>&1 | grep -v WARNING >> "$OUT"
    echo "=== done ===" >> "$OUT"
    exit 0
  fi
  sleep 60
done
echo "TPU never came back" >> "$OUT"
exit 1
