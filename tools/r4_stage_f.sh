#!/bin/bash
# Round-4 stage F: (a) CD-only noscan probe at 262k to split CD vs carry
# inside the 938 ms stage-E "CD+carry"; (b) p2/p3 re-measure with the
# sort-based _merge_match (scatters -> un-sort) to quantify the carry win
# (stage-E baselines: p2 938 ms, p3 1545 ms, full 1595 ms).
cd /root/repo
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "stageF probe $i $(date +%H:%M) down" >> /tmp/r4_stage_f.log
  sleep 60
done
echo "=== F1 REFRESH BISECT p1/p2/p3 262k $(date) ===" >> /tmp/r4_stage_f.log
timeout 3600 python tools/profile_refresh.py \
  --only p1,p2,p3,refresh_noscan >> /tmp/r4_stage_f.log 2>&1
echo "=== STAGE F DONE $(date) ===" >> /tmp/r4_stage_f.log
