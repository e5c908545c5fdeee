#!/bin/bash
# Round-5 phase E: single-chip envelope probe beyond 4M (6M/8M) — the
# subset join bounds the dense join's HBM footprint, so the r4 "~4M"
# edge may have moved.  (Relaunch of the phase-D step that died with the
# container restart.)
ROOT="${1:-/root/repo}"
LOGDIR=/root/repo/evidence_r5
mkdir -p "$LOGDIR"
cd "$ROOT"
wait_tpu() {
  for i in $(seq 1 60); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queueE] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"; return 0
    fi
    echo "[queueE] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"; sleep 120
  done
  return 1
}
step() {
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueE] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueE] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[queueE] END $name rc=$? $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}
step envelope6m_r5 7200 python scripts/scaling_study.py --sizes 6291456
step envelope8m_r5 7200 python scripts/scaling_study.py --sizes 8388608
echo "[queueE] PHASE E DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
