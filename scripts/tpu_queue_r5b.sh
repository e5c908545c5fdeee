#!/bin/bash
# Round-5 TPU evidence queue, phase B: tight_edges_only re-validation
# (phase A measured the fog-polish attractor: 4M 2/2 but 6.28 mm / 2.61
# deg, 2M 4.82 mm, recall500k max 2.34 mm — all at the all-point annealed
# polish), then the cold-start / serving / fixture rows behind VERDICT r4
# items 4-7.
#   1. scaling 2M/4M at the edge-anchored polish — done = 2/2 at <0.1 mm.
#   2. diag4m_s2: the envelope-edge seed explicitly.
#   3. recall protocol 500k + 131k: pose-error regression gate for the
#      polish change (131k = no-fog-switch control).
#   4. serving_warm: api.Matcher stream WITH warmup(dense=True) — done =
#      p95 <= 15 s (the r4 p95 was one cold dense-flavor compile).
#   5. config4: full-scale config 4 at the two-rung eff_b2 ladder — done =
#      cold first search <= 60 s (r4: 342.6 s compile).
#   6. config5: two-model 1M raycast config with the per-model stats rows
#      (search_s/raycast_s/rounds) — the 477 s attribution.
#   7. recall_lowedge: 10-seed 500k touching fog on the 3.5%-edge model —
#      adversarial case for the rank_edges_only + tight_edges_only
#      auto-triggers.
#   8. recall_lattice: 10-seed 131k on the graded scaffold lattice —
#      big-bucket (>query_limit) regime for the strided bucket read.
#   9. bench + bench_dense: headline + dense-regime rows.
# Run from a snapshot tree (first arg) so builder edits don't contaminate.
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
      echo "[queueB] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueB] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueB] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueB] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueB] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step scaling_r5c 10800 python scripts/scaling_study.py --sizes 2097152,4194304
step diag4m_s2_r5c 7200 python scripts/diag_dense_fault.py --points 4194304 --seed 2
step recall500k_r5c 10800 python scripts/recall_study.py --seeds 10 --points 500000
step recall131k_r5c 10800 python scripts/recall_study.py --seeds 10 --points 131072
step serving_warm_r5 7200 python scripts/serving_bench.py --warmup
step config4_r5 7200 python scripts/run_baseline_configs.py --configs 4
step config5_r5 7200 python scripts/run_baseline_configs.py --configs 5
step recall_lowedge_r5 10800 python scripts/recall_study.py --seeds 10 --points 500000 --model low-edge
step recall_lattice_r5 7200 python scripts/recall_study.py --seeds 10 --model lattice
step bench_r5 3600 python bench.py
step bench_dense_r5 7200 python bench.py --dense
echo "[queueB] PHASE B DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
