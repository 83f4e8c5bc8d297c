#!/bin/bash
# Wait for the TPU relay, then run the round-3 measurement queue.
cd /root/repo
for i in $(seq 1 90); do
  timeout 60 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep RELAY_OK && break
  echo "probe $i $(date +%H:%M) down"
  sleep 120
done
echo "=== VERIFY POLY ==="
timeout 2500 python tools/verify_r3.py poly 2>&1 | tail -12
echo "=== SWEEP ob/ch ==="
timeout 2400 python tools/sweep_var.py --obs 128,64 2>&1 | tail -8
echo "=== PROFILE FUSED ==="
timeout 2400 python tools/profile_fused.py 2>&1 | tail -8
echo "=== QUEUE DONE $(date) ==="
