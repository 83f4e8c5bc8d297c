#!/bin/bash
# Round-4 stage H: re-measure the reworked refresh (packed gathers) at
# 262k, then a full bench (262k headline + 1M extra) with timers.
# Old-code baselines (stage F): p1 507 / p2 915 / p3 1521 / full 1530 ms.
cd /root/repo
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
wait_relay() {
  for i in $(seq 1 60); do
    probe && return 0
    echo "stageH probe $i $(date +%H:%M) down" >> /tmp/r4_stage_h.log
    sleep 60
  done
}
wait_relay
echo "=== H1 REWORKED REFRESH 262k $(date) ===" >> /tmp/r4_stage_h.log
timeout 4200 python tools/profile_refresh.py \
  --only c0,p1,p2,p3,refresh_noscan >> /tmp/r4_stage_h.log 2>&1
wait_relay
echo "=== H2 BENCH $(date) ===" >> /tmp/r4_stage_h.log
timeout 5400 python bench.py --timers >> /tmp/r4_stage_h.log 2>&1
echo "=== STAGE H DONE $(date) ===" >> /tmp/r4_stage_h.log
