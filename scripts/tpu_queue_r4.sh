#!/bin/bash
# Round-4 TPU evidence queue, phase A (VERDICT r3 "missing #1"): hardware
# acceptance at the SHIPPED round-3 defaults — full-scale baseline configs,
# config-4 bisect, recall studies — with results written into the repo
# (evidence_r4/), not /tmp.
#
# Advisor findings (ADVICE.md r3) fixed here:
#  * wait and run budgets are SEPARATE: the tunnel wait runs without an
#    outer timeout (it can retry for hours legitimately); the step timeout
#    governs only the actual run.
#  * tpu_wait_then.sh now exits 97 on the gave-up path, and the queue.log
#    records that distinctly — rc=0 can no longer mean "never ran".
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

wait_tpu() {  # gentle probe: long per-probe timeout, long sleep (stale-lease expiry)
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
    sleep 300
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queue] NEVER-RAN $name (tunnel never came up)" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queue] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queue] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  # harvest result rows (scripts print one JSON object per line)
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step bench       1800 python bench.py
step recall131k  5400 python scripts/recall_study.py --seeds 10
step recall500k 10800 python scripts/recall_study.py --seeds 10 --points 500000
step bisect_def  5400 python scripts/bisect_config4.py --variant default
step configs    14400 python scripts/run_baseline_configs.py --configs 1,2,3,4,5,6
echo "[queue] PHASE A DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
