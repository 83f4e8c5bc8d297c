#!/bin/bash
# Round-3 wrap measurement queue (fresh machine, cold cache).
# Chains after the mono-262k bench (PID in /tmp/bench.pid): flagship 1M,
# poly 262k, uniq A/B probe. One TPU process at a time, all bounded.
cd /root/repo
BPID=$(cat /tmp/bench.pid 2>/dev/null || echo 0)
while [ "$BPID" != "0" ] && kill -0 "$BPID" 2>/dev/null; do sleep 20; done
probe() {
  timeout 60 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "wrap probe $i $(date +%H:%M) down" >> /tmp/r3_wrap.log
  sleep 60
done
echo "=== W1 BENCH 1M flagship $(date) ===" >> /tmp/r3_wrap.log
timeout 3000 python bench.py --n 1048576 --steps 100 --warmup 200 --timers \
  >> /tmp/r3_wrap.log 2>&1
echo "=== W2 BENCH poly 262k $(date) ===" >> /tmp/r3_wrap.log
timeout 3000 python bench.py --poly --timers >> /tmp/r3_wrap.log 2>&1
echo "=== W3 PROBE uniq $(date) ===" >> /tmp/r3_wrap.log
timeout 2400 python tools/probe_uniq.py >> /tmp/r3_wrap.log 2>&1
echo "=== WRAP QUEUE DONE $(date) ===" >> /tmp/r3_wrap.log
