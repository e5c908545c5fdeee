#!/bin/bash
# Round-4 TPU evidence queue, phase T: re-validate the 4M envelope with the
# exact-count finalist prescreen (policy.finalist_prescreen) bounding the
# widened-funnel join — phase S bisect showed funnel 16 x icp 10 exceeds the
# single-program runtime horizon at 4M while funnel<=8 or icp<=3 complete;
# the prescreen keeps funnel-16 RANKING but only base-funnel ICP depth
# (16 + 4*(icp+1) scene passes instead of 16*(icp+1)).
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
      echo "[queueU] tunnel up (attempt $i) $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queueU] tpu wait $i $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
    sleep 120
  done
  return 1
}

step() {  # step <name> <run_timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  wait_tpu || { echo "[queueU] NEVER-RAN $name" >> "$LOGDIR/queue.log"; return 1; }
  echo "[queueU] START $name $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "[queueU] END $name rc=$rc $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
  grep -h '^{' "$LOGDIR/$name.log" > "$LOGDIR/$name.jsonl" 2>/dev/null
}

# Phase U: why does 4M scene-seed 2 still miss after the funnel raise +
# prescreen?  Bisect: (A) widened funnel WITHOUT prescreen at icp 3 (inside
# the runtime horizon) — does the true pose crack the 16-finalist set at
# all?  (B) prescreen 4 at icp 3 — does the exact-count prescreen at the
# UNREFINED pose drop it?  (C) funnel 32 + prescreen 4 — is the set just
# too narrow?  All on scene seed 2 (scaling_study's missing seed).
step diag4m_s2_f16_nopre 4200 python scripts/diag_dense_fault.py --points 4194304 --seed 2 --finalists 16 --prescreen -1 --icp 3
step diag4m_s2_f16_pre4 4200 python scripts/diag_dense_fault.py --points 4194304 --seed 2 --finalists 16 --prescreen 4 --icp 3
step diag4m_s2_f32_pre4 4200 python scripts/diag_dense_fault.py --points 4194304 --seed 2 --finalists 32 --prescreen 4 --icp 3
echo "[queueU] PHASE U DONE $(date +%H:%M:%S)" >> "$LOGDIR/queue.log"
