#!/bin/bash
# Round-4 stage B: waits for stage A, then runs the dynamics_step ablation.
cd /root/repo
APID=$(cat /tmp/r4_stage_a.pid 2>/dev/null || echo 0)
while [ "$APID" != "0" ] && kill -0 "$APID" 2>/dev/null; do sleep 30; done
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "stageB probe $i $(date +%H:%M) down" >> /tmp/r4_stage_b.log
  sleep 60
done
echo "=== B1 PROFILE STEP ABLATION $(date) ===" >> /tmp/r4_stage_b.log
timeout 3000 python tools/profile_step2.py >> /tmp/r4_stage_b.log 2>&1
echo "=== STAGE B DONE $(date) ===" >> /tmp/r4_stage_b.log
