#!/bin/bash
# Stage-2 measurement queue: waits for tpu_queue.sh (stage 1) to exit,
# re-probes the relay, re-runs any stage-1 payloads that never ran, then
# runs the round-3 bench ladder. Never overlaps TPU processes.
cd /root/repo
LOG=/tmp/tpu_queue.log
L2=/tmp/tpu_queue2.log

# wait for stage 1 to exit (it holds the relay watchdog); PID passed in $1
Q1PID=${1:-0}
while [ "$Q1PID" != "0" ] && kill -0 "$Q1PID" 2>/dev/null; do
  sleep 60
done

probe() {
  timeout 60 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}

for i in $(seq 1 200); do
  probe && break
  echo "q2 probe $i $(date +%H:%M) down"
  sleep 120
done
probe || { echo "q2: relay never returned"; exit 1; }
echo "q2: relay up $(date)"

if ! grep -q "VERIFY_R3_ALL_OK\|poly3. OK" $LOG 2>/dev/null; then
  echo "=== q2 VERIFY POLY ==="
  timeout 3000 python tools/verify_r3.py poly 2>&1 | tail -12
fi
echo "=== q2 SWEEP (ob x ch) ==="
VAR_CHS=512,1024 timeout 3000 python tools/sweep_var.py --obs 256,128 2>&1 | tail -12
VAR_CHS=256 timeout 1200 python tools/sweep_var.py --obs 64 2>&1 | tail -5
if ! grep -q "PROFILE FUSED done" $LOG 2>/dev/null; then
  echo "=== q2 PROFILE FUSED ==="
  timeout 2400 python tools/profile_fused.py 2>&1 | tail -10
fi
echo "=== q2 BENCH 262k (timers) ==="
timeout 3000 python bench.py --timers 2>&1 | tail -6
echo "=== q2 BENCH 262k auto-K ==="
timeout 3000 python bench.py --auto --timers 2>&1 | tail -6
echo "=== q2 BENCH poly 262k ==="
timeout 3600 python bench.py --poly --timers 2>&1 | tail -6
echo "=== q2 PROBE uniq A/B ==="
timeout 3000 python tools/probe_uniq.py 2>&1 | tail -8
echo "=== q2 BENCH 262k uniq-fetch ==="
timeout 3600 python bench.py --uniq 1024 --timers 2>&1 | tail -6
echo "=== q2 BENCH 1M flagship ==="
timeout 5400 python bench.py --n 1048576 --steps 100 --warmup 200 --timers 2>&1 | tail -8
echo "=== q2 DONE $(date) ==="
