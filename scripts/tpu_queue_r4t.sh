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
      echo "[queueT] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueT] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueT] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueT] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueT] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step scaling_t 10800 python scripts/scaling_study.py --sizes 2097152,4194304
step bench7 1800 python bench.py
echo "[queueT] PHASE T DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
