"""Scene-size scaling of steady-state end-to-end search on hardware.

For each scene size: prepare + TWO find_all calls on different seeds (the
second is steady-state — round executables cached, XLA disk cache warm) and
one JSON line with prepare/search timings.  Sizes run in isolated
subprocesses (the TPU tunnel can fault with INVALID_ARGUMENT after
sustained in-process use — same mitigation as run_baseline_configs).

    python scripts/scaling_study.py [--sizes 131072,524288,1048576]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(n_pts: int):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from recall_study import build_scene
    from run_baseline_configs import _sym_delta

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import make_box_model
    from triplet_match_tpu.search.driver import find_all, prepare_scene

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    policy = SearchPolicy()
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)

    rows = []
    for seed in (1, 2):
        scene, t_gt = build_scene(n_pts, seed)
        t0 = time.perf_counter()
        prep = prepare_scene(scene, policy)
        jax.block_until_ready(prep.tangent_mask)
        t_prep = time.perf_counter() - t0
        t0 = time.perf_counter()
        m = find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                     sample_params=sample, discretization=disc, policy=policy,
                     max_icp_iterations=10, seed=5, prep=prep)
        t_search = time.perf_counter() - t0
        dt, dr = _sym_delta(m[0].transform, t_gt) if m else (None, None)
        rows.append((t_prep, t_search, len(m), dt, dr))
    # HBM peak (single-chip envelope evidence; None off-TPU)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        hbm_peak_gb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2) or None
    except Exception:
        hbm_peak_gb = None
    # no-match runs leave dt/dr as None — emit found=0 rows with null deltas
    # instead of letting max() raise and mask the result as a script failure
    dts = [r[3] for r in rows if r[3] is not None]
    drs = [r[4] for r in rows if r[4] is not None]
    print(json.dumps({
        "scene_points": n_pts,
        "prepare_s_first": round(rows[0][0], 2),
        "prepare_s_steady": round(rows[1][0], 2),
        "search_s_first": round(rows[0][1], 2),
        "search_s_steady": round(rows[1][1], 2),
        "found": sum(r[2] for r in rows),
        "worst_translation_mm": round(max(dts) * 1000, 3) if dts else None,
        "worst_rotation_deg": round(max(drs), 4) if drs else None,
        "hbm_peak_gb": hbm_peak_gb,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="131072,524288,1048576")
    ap.add_argument("--one", type=int, default=None)
    args = ap.parse_args()

    if args.one is not None:
        run_one(args.one)
        return
    for s in args.sizes.split(","):
        res = subprocess.run([sys.executable, os.path.abspath(__file__), "--one", s.strip()])
        if res.returncode != 0:
            print(json.dumps({"scene_points": int(s), "FAILED": res.returncode}), flush=True)


if __name__ == "__main__":
    main()
