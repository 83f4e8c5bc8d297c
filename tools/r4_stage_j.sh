#!/bin/bash
# Round-4 stage J: flagship retry with two-class CD auto-enabled at the
# GRC mix ratio (1.87 > 1.7 threshold; the single-grid XLA fallback sweep
# crashed the worker in stage I), then the final full bench (262k + 1M)
# with the leaner finalize + relayout OOM fix — this run also warms the
# compile cache for the driver's end-of-round bench.
cd /root/repo
for i in $(seq 1 240); do
  grep -q "STAGE I DONE" /tmp/r4_stage_i.log 2>/dev/null && break
  sleep 60
done
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
wait_relay() {
  for i in $(seq 1 90); do
    probe && return 0
    echo "stageJ probe $i $(date +%H:%M) down" >> /tmp/r4_stage_j.log
    sleep 60
  done
}
wait_relay
echo "=== J1 FLAGSHIP RETRY 524288 two-class $(date) ===" >> /tmp/r4_stage_j.log
timeout 9000 python tools/flagship_wheeldp.py --n 524288 \
  --settle 0.02 --drive 0.03 --out /tmp/flagship524k \
  >> /tmp/r4_stage_j.log 2>&1
wait_relay
echo "=== J2 FINAL BENCH $(date) ===" >> /tmp/r4_stage_j.log
timeout 7200 python bench.py --timers >> /tmp/r4_stage_j.log 2>&1
wait_relay
echo "=== J3 AUTO-CADENCE BENCH 262k $(date) ===" >> /tmp/r4_stage_j.log
timeout 4200 python bench.py --auto --skip-1m --timers \
  >> /tmp/r4_stage_j.log 2>&1
echo "=== STAGE J DONE $(date) ===" >> /tmp/r4_stage_j.log
