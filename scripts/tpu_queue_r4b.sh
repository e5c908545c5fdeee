#!/bin/bash
# Round-4 TPU evidence queue, phase B.  Waits for phase A
# (tpu_queue_r4.sh) to finish, then:
#   * smoke   — hardware parity of the chunked/multi-group coarse kernel at
#               the exact shape family that OOMed the unchunked kernel
#   * recall131k/500k v2 — the 10-seed touching-fog recall protocol at the
#               SHIPPED policy defaults (coarse:8:32:4) + the exact-scorer
#               control (VERDICT r3 missing #1; the phase-A runs died on
#               the kernel VMEM OOM)
#   * raycast / serving — committed artifacts behind the README perf claims
#               (VERDICT r3 next #4)
#   * scaling — single-chip scene-size envelope to 4M points (next #7)
#   * bench2  — bench.py after the kernel rework (fixed-cost amortization)
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

# wait for phase A: its last act is writing PHASE A DONE to queue.log
for i in $(seq 1 600); do
  grep -q "PHASE A DONE" "$LOGDIR/queue.log" 2>/dev/null && break
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
      echo "[queueB] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueB] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 300
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

step smoke          1800 python scripts/smoke_coarse_kernel.py
step recall131k_v2  5400 python scripts/recall_study.py --seeds 10
step recall500k_v2 10800 python scripts/recall_study.py --seeds 10 --points 500000
step raycast        3600 python scripts/raycast_bench.py
step serving        5400 python scripts/serving_bench.py
step serving2       5400 python scripts/serving_bench.py --models 2
step scaling       14400 python scripts/scaling_study.py --sizes 2097152,4194304
step bench2         1800 python bench.py
echo "[queueB] PHASE B DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
