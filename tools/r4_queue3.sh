#!/bin/bash
# Round-4 third-sitting TPU queue: wait for the running bench (pid in
# /tmp/bench2.pid) to exit, probe the relay, then run stage L (flagship
# WheelDP chain at 524k — VERDICT r3 #8).
BPID=$(cat /tmp/bench2.pid 2>/dev/null)
while [ -n "$BPID" ] && kill -0 "$BPID" 2>/dev/null; do
  sleep 30
done
probe() {
  timeout 150 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
cd /root/repo
for i in $(seq 1 90); do
  probe && break
  echo "queue3 probe $i $(date +%H:%M) down" >> /tmp/r4_stage_l.log
  sleep 60
done
echo "=== L1 FLAGSHIP v4 524288 $(date) ===" >> /tmp/r4_stage_l.log
timeout 10000 python tools/flagship_wheeldp.py --n 524288 \
  --settle 0.02 --drive 0.03 --out /tmp/flagship524k \
  >> /tmp/r4_stage_l.log 2>&1
echo "=== STAGE L DONE $(date) ===" >> /tmp/r4_stage_l.log
