#!/bin/bash
# Round-4 stage E: refresh composition bisection at 262k — noscan ground
# truth for the full refresh vs chained CD+carry / CD+carry+finalize
# prefixes (stage D scan-probe components summed to 634 ms vs 2954 ms
# "full"; find where the difference lives).
cd /root/repo
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "stageE probe $i $(date +%H:%M) down" >> /tmp/r4_stage_e.log
  sleep 60
done
echo "=== E1 REFRESH BISECT 262k $(date) ===" >> /tmp/r4_stage_e.log
timeout 3000 python tools/profile_refresh.py \
  --only refresh_noscan,p2,p3 >> /tmp/r4_stage_e.log 2>&1
echo "=== STAGE E DONE $(date) ===" >> /tmp/r4_stage_e.log
