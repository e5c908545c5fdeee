#!/bin/bash
# Round-4 TPU evidence queue, phase C — after the Mosaic-legal chunked
# coarse kernel fix (ROADMAP 3d9 final form):
#   * smoke       — hardware parity at the shape family whose illegal pt=4
#                   tile failed lowering in phase B
#   * sweepgb     — group_block/pose_tile amortization sweep (the 3d4
#                   fixed-cost lever, VERDICT r3 next #3)
#   * recall131k/500k v3 — shipped defaults + exact control, per-seed
#                   breakdown (the 500k 3.24 mm outlier needs a seed id)
#   * fine512     — end-to-end study of the validated-headroom config at
#                   131k (VERDICT r3 next #3: flip if search seconds win)
#   * bench3      — bench.py at defaults after the fix
# Wait budget is separated from each step's run budget (advisor r3).
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

wait_tpu() {
  for i in $(seq 1 200); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queueC] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueC] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 300
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueC] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueC] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueC] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step smoke2         2400 python scripts/smoke_coarse_kernel.py
step sweepgb        3600 python scripts/sweep_kernel_knobs.py --only default,gb1,gb2,gb4,gb16,gb32,pt8_gb16,pt16_gb16,pt64_gb16
step recall131k_v3  5400 python scripts/recall_study.py --seeds 10
step recall500k_v3 10800 python scripts/recall_study.py --seeds 10 --points 500000
step fine512_131k   5400 python scripts/recall_study.py --seeds 10 --fine-points 512
step bench3         1800 python bench.py
echo "[queueC] PHASE C DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
