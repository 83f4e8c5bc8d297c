#!/bin/bash
# Round-4 stage D: refresh-component breakdown at 262k (the ~950 ms/refresh
# mystery from C2).
cd /root/repo
CPID=$(cat /tmp/r4_stage_c.pid 2>/dev/null || echo 0)
while [ "$CPID" != "0" ] && kill -0 "$CPID" 2>/dev/null; do sleep 30; done
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "stageD probe $i $(date +%H:%M) down" >> /tmp/r4_stage_d.log
  sleep 60
done
echo "=== D1 PROFILE REFRESH 262k $(date) ===" >> /tmp/r4_stage_d.log
timeout 3000 python tools/profile_refresh.py >> /tmp/r4_stage_d.log 2>&1
echo "=== STAGE D DONE $(date) ===" >> /tmp/r4_stage_d.log
