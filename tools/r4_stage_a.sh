#!/bin/bash
# Round-4 stage A measurement queue: step-glue breakdown + uniq A/B +
# baseline bench with timers. One TPU process at a time, all bounded.
cd /root/repo
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "stageA probe $i $(date +%H:%M) down" >> /tmp/r4_stage_a.log
  sleep 60
done
echo "=== A1 PROFILE FUSED 262k $(date) ===" >> /tmp/r4_stage_a.log
timeout 3000 python tools/profile_fused.py >> /tmp/r4_stage_a.log 2>&1
echo "=== A2 PROBE UNIQ $(date) ===" >> /tmp/r4_stage_a.log
timeout 3000 python tools/probe_uniq.py >> /tmp/r4_stage_a.log 2>&1
echo "=== A3 BENCH 262k timers $(date) ===" >> /tmp/r4_stage_a.log
timeout 3000 python bench.py --timers >> /tmp/r4_stage_a.log 2>&1
echo "=== STAGE A DONE $(date) ===" >> /tmp/r4_stage_a.log
