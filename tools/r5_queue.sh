#!/bin/bash
# Round-5 TPU measurement queue: waits for the flagship run (pid in
# /tmp/r5_flagship.pid) to exit, then runs the step-budget probes
# sequentially — never two TPU processes at once; probes the relay
# between runs (a crashed TPU call wedges it ~5-10 min).
cd /root/repo

while kill -0 "$(cat /tmp/r5_flagship.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== flagship done $(date) ===" >> /tmp/r5_queue.log

probe() {
  timeout 150 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
waitrelay() {
  for i in $(seq 1 30); do
    probe && return 0
    echo "probe $i down $(date +%H:%M)" >> /tmp/r5_queue.log
    sleep 60
  done
}

run() {  # run <tag> <cmd...>
  tag=$1; shift
  waitrelay
  echo "=== $tag start $(date) ===" >> /tmp/r5_queue.log
  timeout 4000 "$@" > "/tmp/r5_q_$tag.log" 2>&1
  echo "=== $tag rc=$? done $(date) ===" >> /tmp/r5_queue.log
}

run budget262 python tools/r5_step_budget.py --n 262144
run sweep262 python tools/r5_step_budget.py --n 262144 --sweep
run budget1m python tools/r5_step_budget.py --n 1048576 --warm 200
echo "=== QUEUE DONE $(date) ===" >> /tmp/r5_queue.log
