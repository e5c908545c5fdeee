#!/bin/bash
# Round-4 TPU evidence queue, phase T: re-validate the 4M envelope with the
# exact-count finalist prescreen (policy.finalist_prescreen) bounding the
# widened-funnel join — phase S bisect showed funnel 16 x icp 10 exceeds the
# single-program runtime horizon at 4M while funnel<=8 or icp<=3 complete;
# the prescreen keeps funnel-16 RANKING but only base-funnel ICP depth
# (16 + 4*(icp+1) scene passes instead of 16*(icp+1)).
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

wait_tpu() {
  for i in $(seq 1 60); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queueV] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueV] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueV] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueV] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueV] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

# Phase V: gate the edge-only fog ranking (policy.rank_edges_only, auto via
# the density switch) on hardware.  (1) 2M/4M scaling — 4M seed 2 is the
# miss this fixes; (2) 10-seed 500k recall — the switch fires there too, so
# this is the regression gate for the ranking change (CLAUDE.md protocol).
step scaling_v 10800 python scripts/scaling_study.py --sizes 2097152,4194304
step recall500k_v4 10800 python scripts/recall_study.py --seeds 10 --points 500000
echo "[queueV] PHASE V DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
