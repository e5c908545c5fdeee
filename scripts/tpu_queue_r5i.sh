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
  grep -q "PHASE H DONE" "$LOGDIR/queue.log" && break
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
      echo "[queueI] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"; return 0
    fi
    echo "[queueI] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"; sleep 120
  done
  return 1
}
step() {
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueI] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueI] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[queueI] END $name rc=$? $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}
step scaling_final_r5 10800 python scripts/scaling_study.py --sizes 2097152,4194304,6291456,8388608
step recall500k_final_r5 7200 python scripts/recall_study.py --seeds 10 --points 500000
step recall131k_final_r5 5400 python scripts/recall_study.py --seeds 10 --points 131072
step recall_lowedge_final_r5 7200 python scripts/recall_study.py --seeds 10 --points 500000 --model low-edge
step latency_final_r5 7200 python scripts/scaling_study.py --sizes 131072,524288,1048576
step bench_final_r5 3600 python bench.py
step bench_dense_final_r5 3600 python bench.py --dense
echo "[queueI] PHASE I DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
