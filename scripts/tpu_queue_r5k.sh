#!/bin/bash
# Round-5 phase I: FINAL full validation at the settled round-5 tree
# (floor-gated point-to-line polish + precision-pinned GN composes +
# raw-tangent scene gate): the complete scaling envelope 2M-8M, the
# recall protocol (500k + 131k control + low-edge + lattice), and the
# bench artifacts.  Waits for phase H.
ROOT="${1:-/root/repo}"
LOGDIR=/root/repo/evidence_r5
mkdir -p "$LOGDIR"
cd "$ROOT"
for i in $(seq 1 240); do
  grep -q "PHASE J DONE" "$LOGDIR/queue.log" && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 60); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queueK] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"; return 0
    fi
    echo "[queueK] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"; sleep 120
  done
  return 1
}
step() {
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueK] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueK] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[queueK] END $name rc=$? $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}
step envelope12m_r5 10800 python scripts/scaling_study.py --sizes 12582912
step envelope16m_r5 10800 python scripts/scaling_study.py --sizes 16777216
echo "[queueK] PHASE K DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
