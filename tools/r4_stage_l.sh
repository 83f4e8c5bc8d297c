#!/bin/bash
# Round-4 stage L: flagship attempt 4 — overlap-free layered packing
# (attempt 3) PLUS the CD axis relabeling (22839a2), which keeps the
# Pallas sweep window within N/nb_max rows on the wide flat flagship
# bed (attempts 1-3 tripped OVF_PALLAS_WIN and the XLA fallback sweep
# crashed the TPU worker). Run AFTER the r4 bench finishes.
cd /root/repo
probe() {
  timeout 150 python -c "import jax,jax.numpy as jnp; print('RELAY_OK', float(jnp.ones((8,8)).sum()))" 2>/dev/null | grep -q RELAY_OK
}
for i in $(seq 1 90); do
  probe && break
  echo "stageL probe $i $(date +%H:%M) down" >> /tmp/r4_stage_l.log
  sleep 60
done
echo "=== L1 FLAGSHIP v4 524288 $(date) ===" >> /tmp/r4_stage_l.log
timeout 10000 python tools/flagship_wheeldp.py --n 524288 \
  --settle 0.02 --drive 0.03 --out /tmp/flagship524k \
  >> /tmp/r4_stage_l.log 2>&1
echo "=== STAGE L DONE $(date) ===" >> /tmp/r4_stage_l.log
