#!/bin/bash
# Serial TPU queue: wait for stage G, then run the round-4 /verify driver.
cd /root/repo
for i in $(seq 1 120); do
  grep -q "STAGE G DONE" /tmp/r4_stage_g.log 2>/dev/null && break
  sleep 60
done
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 30); do
  probe && break
  echo "verify probe $i $(date +%H:%M) down" >> /tmp/r4_verify.log
  sleep 60
done
echo "=== VERIFY R4 $(date) ===" >> /tmp/r4_verify.log
timeout 3000 python tools/verify_r4.py >> /tmp/r4_verify.log 2>&1
echo "=== VERIFY EXIT $? $(date) ===" >> /tmp/r4_verify.log
