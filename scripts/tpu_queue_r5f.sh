#!/bin/bash
# Round-5 phase F: point-to-line edge anchor (policy.tight_point_to_line,
# auto with the fog switch) hardware validation — scaling 2M/4M, the
# 500k recall protocol, the low-edge adversarial model, and the 131k
# control (fog switch inert there, must stay bit-identical).
# Waits for phase E (envelope probe) to finish before touching the TPU.
ROOT="${1:-/root/repo}"
LOGDIR=/root/repo/evidence_r5
mkdir -p "$LOGDIR"
cd "$ROOT"
for i in $(seq 1 240); do
  grep -q "PHASE E DONE" "$LOGDIR/queue.log" && break
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
      echo "[queueF] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"; return 0
    fi
    echo "[queueF] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"; sleep 120
  done
  return 1
}
step() {
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueF] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueF] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[queueF] END $name rc=$? $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}
step diag6m_s1_r5 3600 python scripts/diag_dense_fault.py --points 6291456 --seed 1
step diag6m_s2_r5 3600 python scripts/diag_dense_fault.py --points 6291456 --seed 2
step scaling_p2l_r5 7200 python scripts/scaling_study.py --sizes 2097152,4194304
step recall500k_p2l_r5 5400 python scripts/recall_study.py --points 500000
step recall_lowedge_p2l_r5 5400 python scripts/recall_study.py --points 500000 --model low-edge
step recall131k_p2l_r5 3600 python scripts/recall_study.py --points 131072
echo "[queueF] PHASE F DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
