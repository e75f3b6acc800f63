#!/bin/bash
# Wait for the tunneled chip to respond, then run the kernel experiment
# sequence serially (concurrent clients wedge the tunnel's compile helper).
set -u
cd /root/repo

probe() {
  timeout 45 python - <<'EOF' >/dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
import sourmash_tpu
x = jnp.zeros(8, jnp.int32)
assert int(np.asarray(x + 1)[0]) == 1
EOF
}

for i in $(seq 1 "${PROBE_TRIES:-8}"); do
  if probe; then
    echo "device up (probe $i)"
    break
  fi
  echo "device down (probe $i); sleeping"
  sleep 45
done
probe || { echo "device still down; giving up"; exit 7; }

run() {
  echo "=== $* ==="
  timeout 580 "$@" 2>&1 | grep -v -i "warn\|info\|landlock" | tail -4
}

run python tools/profile_sketch_parts.py murmur
run python tools/exp_v2_kernel.py check
run python tools/exp_v2_kernel.py time
run python tools/exp_split_kernel.py check
run python tools/exp_split_kernel.py time
run python tools/profile_latency.py
echo "=== experiments done ==="
