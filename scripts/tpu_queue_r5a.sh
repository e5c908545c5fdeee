#!/bin/bash
# Round-5 TPU evidence queue, phase A: the round-4 phase-V validation that
# never ran — gate the edge-only fog ranking (policy.rank_edges_only, auto
# via the density switch) on hardware.
#   1. diag4m_s2: the specific 4M seed-2 recall miss (evidence_r4/diag4m_*)
#      at shipped defaults (funnel 16, prescreen auto, icp 10).
#   2. scaling 2M/4M: the envelope rows (seeds 1+2 each) — done = 4M 2/2
#      at <0.1 mm.
#   3. recall protocol at 500k and 131k (10 seeds): regression gate for the
#      ranking change (CLAUDE.md protocol; the switch fires at 500k, not
#      131k, so 131k is the no-change control).
# Run from a snapshot tree (first arg = repo root to execute in) so builder
# edits on the main tree don't contaminate later steps.
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
      echo "[queueA] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueA] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueA] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueA] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueA] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step diag4m_s2_r5 7200 python scripts/diag_dense_fault.py --points 4194304 --seed 2
step scaling_r5 10800 python scripts/scaling_study.py --sizes 2097152,4194304
step recall500k_r5 10800 python scripts/recall_study.py --seeds 10 --points 500000
step recall131k_r5 10800 python scripts/recall_study.py --seeds 10 --points 131072
echo "[queueA] PHASE A DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
