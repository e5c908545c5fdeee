#!/bin/bash
# Wait for the TPU tunnel to accept a claim (smoke op), then exec the given
# command.  The loopback relay occasionally wedges with a stale session
# grant ("grant unclaimed — client lost"); a fresh process with a fresh
# session_id succeeds once the server releases the lease.
# Usage: tpu_wait_then.sh <logfile> <cmd...>
LOG="$1"; shift
ATTEMPTS="${TPU_WAIT_ATTEMPTS:-120}"
for i in $(seq 1 "$ATTEMPTS"); do
  if timeout 90 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
print('tpu-ok')
" >>"$LOG" 2>&1; then
    echo "[tpu_wait] tunnel up after attempt $i $(date +%H:%M:%S)" >>"$LOG"
    exec "$@" >>"$LOG" 2>&1
  fi
  echo "[tpu_wait] attempt $i failed $(date +%H:%M:%S)" >>"$LOG"
  sleep 60
done
# exhausted retries: exit nonzero so callers never log rc=0 for a step
# that NEVER RAN (advisor finding, round 3)
echo "[tpu_wait] gave up" >>"$LOG"
exit 97
