#!/bin/bash
# Round-4 TPU evidence queue, phase J: diagnose the 4M one-seed recall
# loss under the exact dense routing (rounds/finalists/accepted stats).
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

for i in $(seq 1 900); do
  grep -q "PHASE I DONE" "$LOGDIR/queue.log" 2>/dev/null && break
  sleep 60
done

wait_tpu() {
  for i in $(seq 1 200); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queueJ] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueJ] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 300
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueJ] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueJ] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueJ] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step prof4m 14400 python scripts/profile_find_all.py --points 4194304 --seeds 2 --first-seed 1
step prof2m 7200 python scripts/profile_find_all.py --points 2097152 --seeds 2 --first-seed 1
echo "[queueJ] PHASE J DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
