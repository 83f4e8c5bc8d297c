#!/bin/bash
# Stage B: alternative-config measurements (chains after stage A).
# Defaults are NOT changed here; this measures candidates.
cd /root/repo
APID=${1:-0}
while [ "$APID" != "0" ] && kill -0 "$APID" 2>/dev/null; do sleep 30; done
probe() {
  timeout 60 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 120); do
  probe && break
  echo "stageB probe $i $(date +%H:%M) down"
  sleep 120
done
probe || { echo "stageB: relay never returned"; exit 1; }
echo "=== B1 SWEEP ob x ch $(date) ==="
VAR_CHS=512,1024 timeout 3000 python tools/sweep_var.py --obs 256,128 2>&1 | grep -v cpu_aot_loader | tail -10
echo "=== B2 BENCH 262k uniq-fetch $(date) ==="
timeout 4800 python bench.py --uniq 1024 --timers 2>&1 | grep -v cpu_aot_loader | tail -4
echo "=== B3 BENCH 1M flagship $(date) ==="
timeout 5400 python bench.py --n 1048576 --steps 100 --warmup 200 --timers 2>&1 | grep -v cpu_aot_loader | tail -6
echo "=== STAGE B DONE $(date) ==="
