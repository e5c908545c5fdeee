#!/bin/bash
# Round-4 TPU evidence queue, phase Q: warm the fresh container's compile
# caches for the driver's end-of-round bench (container restart wiped
# /tmp/tmtpu_jax_cache and the AOT cache), and record a final bench row
# from this container.
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

for i in $(seq 1 600); do
  grep -q "PHASE P DONE" "$LOGDIR/queue.log" 2>/dev/null && break
  sleep 30
done

wait_tpu() {
  for i in $(seq 1 60); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queueQ] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueQ] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueQ] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueQ] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueQ] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step bench6 3600 python bench.py
echo "[queueQ] PHASE Q DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
