#!/bin/bash
# Stage A (round-3 wrap): wait for stage-1 queue, then verify + baseline
# measurements. One TPU process at a time, everything bounded.
cd /root/repo
Q1PID=${1:-0}
while [ "$Q1PID" != "0" ] && kill -0 "$Q1PID" 2>/dev/null; do sleep 30; done
probe() {
  timeout 60 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 120); do
  probe && break
  echo "stageA probe $i $(date +%H:%M) down"
  sleep 120
done
probe || { echo "stageA: relay never returned"; exit 1; }
echo "=== A1 VERIFY (mono+poly) $(date) ==="
timeout 5400 python tools/verify_r3.py all 2>&1 | grep -v cpu_aot_loader | tail -25
echo "=== A2 BENCH 262k default $(date) ==="
timeout 5400 python bench.py --timers 2>&1 | grep -v cpu_aot_loader | tail -4
echo "=== A3 PROBE uniq $(date) ==="
timeout 3000 python tools/probe_uniq.py 2>&1 | grep -v cpu_aot_loader | tail -8
echo "=== A4 BENCH 262k auto-K $(date) ==="
timeout 3600 python bench.py --auto --timers 2>&1 | grep -v cpu_aot_loader | tail -4
echo "=== A5 BENCH poly $(date) ==="
timeout 5400 python bench.py --poly --timers 2>&1 | grep -v cpu_aot_loader | tail -4
echo "=== STAGE A DONE $(date) ==="
