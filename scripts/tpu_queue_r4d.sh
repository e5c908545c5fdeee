#!/bin/bash
# Round-4 TPU evidence queue, phase D.  Waits for phase C, then:
#   * scaling131_1m — scaling_study at 131k/524k/1M: the committed artifact
#                     behind README's end-to-end latency table (every README
#                     number must resolve to a committed row — VERDICT r3
#                     next #4), refreshed under the round-4 kernel.
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

for i in $(seq 1 600); do
  grep -q "PHASE C DONE" "$LOGDIR/queue.log" 2>/dev/null && break
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
      echo "[queueD] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueD] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 300
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueD] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueD] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueD] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step scaling131_1m 10800 python scripts/scaling_study.py --sizes 131072,524288,1048576
echo "[queueD] PHASE D DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
