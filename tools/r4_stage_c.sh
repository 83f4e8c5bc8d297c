#!/bin/bash
# Round-4 stage C: physics verify + end-to-end benches of the round-4 code
# (premix-slim carry, chunked layouts, poly CD rework, adaptive bin).
cd /root/repo
probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 60); do
  probe && break
  echo "stageC probe $i $(date +%H:%M) down" >> /tmp/r4_stage_c.log
  sleep 60
done
echo "=== C1 VERIFY R4 $(date) ===" >> /tmp/r4_stage_c.log
timeout 3000 python tools/verify_r4.py all >> /tmp/r4_stage_c.log 2>&1
echo "=== C2 BENCH 262k $(date) ===" >> /tmp/r4_stage_c.log
timeout 3000 python bench.py --timers >> /tmp/r4_stage_c.log 2>&1
echo "=== C3 BENCH 262k uniq512 $(date) ===" >> /tmp/r4_stage_c.log
timeout 3000 python bench.py --timers --uniq 512 >> /tmp/r4_stage_c.log 2>&1
echo "=== C4 BENCH poly 262k $(date) ===" >> /tmp/r4_stage_c.log
timeout 3000 python bench.py --timers --poly >> /tmp/r4_stage_c.log 2>&1
echo "=== C5 BENCH 1M $(date) ===" >> /tmp/r4_stage_c.log
timeout 4500 python bench.py --n 1048576 --steps 100 --warmup 200 --timers >> /tmp/r4_stage_c.log 2>&1
echo "=== STAGE C DONE $(date) ===" >> /tmp/r4_stage_c.log
