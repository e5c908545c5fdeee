#!/bin/bash
# Round-4 TPU evidence queue, phase F.  Waits for phase E, then:
#   * sweepbf16 — d2_bf16 (bf16 distance-tile sweep traffic) vs default,
#                 alone and with group fold 16 (the VPU min-sweep VMEM
#                 traffic is the kernel's other balanced cost term)
LOGDIR=/root/repo/evidence_r4
mkdir -p "$LOGDIR"
cd /root/repo

for i in $(seq 1 900); do
  grep -q "PHASE E DONE" "$LOGDIR/queue.log" 2>/dev/null && break
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
      echo "[queueF] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueF] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 300
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueF] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueF] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueF] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

step sweepbf16 3600 python scripts/sweep_kernel_knobs.py --only default,d2bf16,d2bf16_gb16
echo "[queueF] PHASE F DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
