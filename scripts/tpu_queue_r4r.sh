#!/bin/bash
# Round-4 TPU evidence queue, phase R: re-run the 2M/4M scaling rows and the
# 4M profile after the chunked finalist map (driver._finalist_map) fixed the
# 34 GB lane-padded [16*N, 3] finalist fusion that OOMed phase P
# (evidence_r4/scaling_fin.log).  2M also re-runs because the finalist raise
# (436c2c2) post-dates the last good 2M row — F=16 at 2M would have hit the
# same fusion (17 GB).
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
      echo "[queueR] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueR] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueR] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueR] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueR] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step scaling_r 5400 python scripts/scaling_study.py --sizes 2097152,4194304
step prof4m_r 3600 python scripts/profile_find_all.py --points 4194304 --seeds 2 --first-seed 1
echo "[queueR] PHASE R DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
