#!/bin/bash
# Round-4 stage I: the flagship reference-scale chain (VERDICT r3 #8) —
# GRC prep at 524288 clumps -> CSV checkpoint -> WheelDP restart with a
# meshed wheel under prescribed slip -> drawbar curve; then the poly
# bench for BENCH_NOTES. Runs after stage H.
cd /root/repo
for i in $(seq 1 180); do
  grep -q "STAGE H DONE" /tmp/r4_stage_h.log 2>/dev/null && break
  sleep 60
done
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
wait_relay() {
  for i in $(seq 1 60); do
    probe && return 0
    echo "stageI probe $i $(date +%H:%M) down" >> /tmp/r4_stage_i.log
    sleep 60
  done
}
wait_relay
echo "=== I1 FLAGSHIP 524288 $(date) ===" >> /tmp/r4_stage_i.log
timeout 9000 python tools/flagship_wheeldp.py --n 524288 \
  --settle 0.02 --drive 0.03 --out /tmp/flagship524k \
  >> /tmp/r4_stage_i.log 2>&1
wait_relay
echo "=== I2 POLY BENCH $(date) ===" >> /tmp/r4_stage_i.log
timeout 4200 python bench.py --poly --timers >> /tmp/r4_stage_i.log 2>&1
echo "=== STAGE I DONE $(date) ===" >> /tmp/r4_stage_i.log
