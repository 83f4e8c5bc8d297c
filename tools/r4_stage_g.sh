#!/bin/bash
# Round-4 stage G: refresh internals at 262k. Stage-F ground truth:
# CD 507 / carry 408 / finalize 606 / other 10 (full 1530 ms).
# c0/c1 split CD into discretize vs raw sweep vs decode; g1/g2 split the
# carry into merge-sort vs un-sort vs gathers; h1/h2 split finalize into
# the 11-op main sort vs everything-but-uniq (uniq cost = p3 - h2).
cd /root/repo
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "stageG probe $i $(date +%H:%M) down" >> /tmp/r4_stage_g.log
  sleep 60
done
echo "=== G1 REFRESH INTERNALS 262k $(date) ===" >> /tmp/r4_stage_g.log
timeout 5400 python tools/profile_refresh.py \
  --only c0,c1,g1,g2,h1,h2 >> /tmp/r4_stage_g.log 2>&1
echo "=== STAGE G DONE $(date) ===" >> /tmp/r4_stage_g.log
