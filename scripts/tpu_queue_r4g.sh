#!/bin/bash
# Round-4 TPU evidence queue, phase G.  Waits for phase F, then profiles
# where end-to-end search seconds go (rounds, phases, round_ms) at 131k
# and 500k recall scenes — the 18 s/scene vs 10.7M poses/s discrepancy.
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

for i in $(seq 1 900); do
  grep -q "PHASE F DONE" "$LOGDIR/queue.log" 2>/dev/null && break
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
      echo "[queueG] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueG] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 300
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueG] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueG] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueG] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step profsearch 7200 python scripts/profile_find_all.py --points 131072 --seeds 3
step profsearch500k 7200 python scripts/profile_find_all.py --points 500000 --seeds 2
echo "[queueG] PHASE G DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
