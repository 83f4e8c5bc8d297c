#!/bin/bash
# Round-4 stage K: flagship attempt 3 — overlap-free layered packing
# (attempts 1/2 started with interpenetrated 1.4x clumps; the released
# energy blew bin occupancy and the XLA fallback sweep crashed the
# worker). Runs after stage J.
cd /root/repo
for i in $(seq 1 240); do
  grep -q "STAGE J DONE" /tmp/r4_stage_j.log 2>/dev/null && break
  sleep 60
done
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 90); do
  probe && break
  echo "stageK probe $i $(date +%H:%M) down" >> /tmp/r4_stage_k.log
  sleep 60
done
echo "=== K1 FLAGSHIP v3 524288 $(date) ===" >> /tmp/r4_stage_k.log
timeout 9000 python tools/flagship_wheeldp.py --n 524288 \
  --settle 0.02 --drive 0.03 --out /tmp/flagship524k \
  >> /tmp/r4_stage_k.log 2>&1
echo "=== STAGE K DONE $(date) ===" >> /tmp/r4_stage_k.log
