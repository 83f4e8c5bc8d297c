#!/bin/bash
# Wrap queue part 2: after the poly bench (pid $1) exits — verify on the
# chip, then the 1M flagship (exercises the new OOM degrade path).
cd /root/repo
BPID=${1:?pid}
while kill -0 "$BPID" 2>/dev/null; do sleep 15; done
probe() {
  timeout 60 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "wrap2 probe $i $(date +%H:%M) down" >> /tmp/r3_wrap2.log
  sleep 60
done
echo "=== V1 VERIFY mono $(date) ===" >> /tmp/r3_wrap2.log
timeout 3000 python tools/verify_r3.py 2>&1 | tail -30 >> /tmp/r3_wrap2.log
echo "=== V2 BENCH 1M flagship (OOM degrade path) $(date) ===" >> /tmp/r3_wrap2.log
timeout 4800 python bench.py --n 1048576 --steps 100 --warmup 200 --timers \
  >> /tmp/r3_wrap2.log 2>&1
echo "=== WRAP2 DONE $(date) ===" >> /tmp/r3_wrap2.log
