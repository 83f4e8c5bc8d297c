#!/bin/bash
# Round-4 stage I2 (replaces the tail of stage I after the flagship
# worker crash): verify driver re-run (fused-path source changed since
# the 10:16 verify), then the poly bench. Writes the STAGE I DONE marker
# stage J waits on.
cd /root/repo
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
wait_relay() {
  for i in $(seq 1 120); do
    probe && return 0
    echo "stageI2 probe $i $(date +%H:%M) down" >> /tmp/r4_stage_i.log
    sleep 60
  done
}
wait_relay
echo "=== I2a VERIFY (post-rework) $(date) ===" >> /tmp/r4_verify.log
timeout 3000 python tools/verify_r4.py >> /tmp/r4_verify.log 2>&1
echo "=== VERIFY EXIT $? $(date) ===" >> /tmp/r4_verify.log
wait_relay
echo "=== I2b POLY BENCH $(date) ===" >> /tmp/r4_stage_i.log
timeout 4200 python bench.py --poly --timers >> /tmp/r4_stage_i.log 2>&1
echo "=== STAGE I DONE $(date) ===" >> /tmp/r4_stage_i.log
