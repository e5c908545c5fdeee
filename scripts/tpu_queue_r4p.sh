#!/bin/bash
# Round-4 TPU evidence queue, phase P (fresh container; compile cache cold):
# 1. smoke6 — coarse-kernel smoke with the corrected envelope assertion AND
#    the linear-kernel VMEM budget fix (3f964d5); replaces failed smoke5.
# 2. scaling_fin — 4M recall re-validation after the density-adaptive
#    finalist-funnel raise (436c2c2).
# 3. prof4m_fin — 4M find_all profile at the settled defaults.
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

wait_tpu() {
  for i in $(seq 1 100); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queueP] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueP] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueP] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueP] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueP] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step smoke6 3600 python scripts/smoke_coarse_kernel.py
step scaling_fin 10800 python scripts/scaling_study.py --sizes 4194304
step prof4m_fin 7200 python scripts/profile_find_all.py --points 4194304 --seeds 2 --first-seed 1
echo "[queueP] PHASE P DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
