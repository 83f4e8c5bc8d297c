#!/bin/bash
# Round-5 queue #2: post-gate-fix measurements. Probes the relay between
# runs; never two TPU processes at once.
cd /root/repo

probe() {
  timeout 150 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
waitrelay() {
  for i in $(seq 1 30); do
    probe && return 0
    echo "probe $i down $(date +%H:%M)" >> /tmp/r5_queue2.log
    sleep 60
  done
}
run() {
  tag=$1; shift
  waitrelay
  echo "=== $tag start $(date) ===" >> /tmp/r5_queue2.log
  timeout 4000 "$@" > "/tmp/r5_q2_$tag.log" 2>&1
  echo "=== $tag rc=$? done $(date) ===" >> /tmp/r5_queue2.log
}

run budget1m python tools/r5_step_budget.py --n 1048576 --warm 200
run scan262 python tools/r5_scan_budget.py --n 262144
run scan262_nomath env DEM_FORCE_NOMATH=1 python tools/r5_scan_budget.py --n 262144
echo "=== QUEUE2 DONE $(date) ===" >> /tmp/r5_queue2.log
