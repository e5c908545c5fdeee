#!/bin/bash
# Round-3 TPU evidence queue (v2): waits for the tunnel, then runs each step
# sequentially with its own timeout and log.  Steps continue on failure
# (a wedge mid-queue must not block later evidence).
#
# v2 wait strategy: the tunnel outage of Aug 17-18 showed killed probe
# clients MIGHT leave stale session grants, so probe gently — a LONG
# per-probe timeout (240s, never kills a slow-but-live claim) and a 6min
# sleep between attempts (lets any stale lease expire between probes).
LOGDIR=/tmp/r3q
mkdir -p "$LOGDIR"
cd /root/repo

wait_tpu() {
  for i in $(seq 1 200); do
    if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/tmtpu_jax_cache')
import jax.numpy as jnp
assert int(jnp.ones(8).sum()) == 8
" >/dev/null 2>&1; then
      echo "[queue] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queue] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 360
  done
  return 1
}

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queue] gave up before $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queue] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "[queue] END $name rc=$? $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
}

step bench     1800 python bench.py
step bisect    7200 python scripts/bisect_config4.py
step recall    5400 python scripts/recall_study.py --seeds 10
step recall500k 7200 python scripts/recall_study.py --seeds 10 --points 500000
step configs  10800 python scripts/run_baseline_configs.py --configs 1,2,3,4,5,6
step bench2    1800 python bench.py
echo "[queue] ALL DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
# appended mid-round (session 4): serving-loop evidence on hardware
step serving  3600 python scripts/serving_bench.py --scenes 12
echo "[queue] ALL DONE (incl. serving) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
