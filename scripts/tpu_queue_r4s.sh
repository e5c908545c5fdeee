#!/bin/bash
# Round-4 TPU evidence queue, phase S: bisect the 4M EXECUTION fault that
# survives the chunked-finalist-map compile fix (phase R: 2M passes 2/2 at
# 0.05 mm, 4M compiles then faults with a generic TPU device error on both
# scaling and profile runs).  Sweep the finalist-join length knobs.
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

wait_tpu() {
  for i in $(seq 1 60); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queueS] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueS] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueS] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueS] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueS] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step diag4m_f4 4200 python scripts/diag_dense_fault.py --points 4194304 --finalists 4
step diag4m_f8 4200 python scripts/diag_dense_fault.py --points 4194304 --finalists 8
step diag4m_f16i3 4200 python scripts/diag_dense_fault.py --points 4194304 --finalists 16 --icp 3
echo "[queueS] PHASE S DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
