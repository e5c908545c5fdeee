#!/bin/bash
# Round-4 TPU evidence queue, phase E.  Waits for phase D, then:
#   * smoke3    — revised coarse-kernel hardware parity: exactness at
#                 mxu_precision=highest, bf16 envelope reported (not
#                 asserted) on the adversarial random fixture, regrouping
#                 invariance on hardware
#   * bisect_ann — config-4 seed at 500k with the annealed tight polish
#   * scaling_ann — 2M/4M retest: the 7.9 mm fog-bias row
#                 (RESULTS_r4 r4_hw_scaling) under tight_anneal=0.5
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

for i in $(seq 1 720); do
  grep -q "PHASE D DONE" "$LOGDIR/queue.log" 2>/dev/null && break
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
      echo "[queueE] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueE] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 300
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueE] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueE] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueE] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step smoke3       2400 python scripts/smoke_coarse_kernel.py
step bisect_ann   3600 python scripts/bisect_config4.py --variant default
step scaling_ann 14400 python scripts/scaling_study.py --sizes 2097152,4194304
echo "[queueE] PHASE E DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
