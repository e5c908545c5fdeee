"""Edge-dense model recall study: pair-table subsampling above the cap.

``compile_model`` linspace-subsamples the edge set above ``max_pair_points``
(index/model.py) where the reference enumerates ALL pairs
(impl/model.hpp:124-149).  The bench models have only ~5k edge points, so
the cap was recall-unvalidated for edge-DENSE geometry (VERDICT r2 weak
#5).  This study builds a graded wireframe lattice (~20k edge points — every
point is an edge point), embeds it in touching fog, and sweeps the cap:

    python scripts/edge_dense_study.py [--seeds 5] [--points 131072] \
        [--caps 2048,4096,8192,0]        # 0 = full edge set (reference)

One JSON line per cap: model compile seconds, pair-table size, recall,
worst pose deltas (the graded spacing breaks the lattice self-symmetries so
ground-truth comparison is direct).  Per-cap subprocess isolation, same as
recall_study.py.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scene(model_arrays, n_points, seed):
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.io.synthetic import fog_patches, rotation_matrix

    xyz, nrm, tan = model_arrays
    rngc = np.random.default_rng(1000 + seed)
    r_inst = rotation_matrix(rngc.normal(size=3), rngc.uniform(0, np.pi))
    t_off = rngc.uniform(-1.5, 1.5, 3).astype(np.float32)

    n_clutter = max(n_points - xyz.shape[0], 0)
    c_xyz, c_nrm = fog_patches(rngc, n_clutter, seed_base=5000 + 100 * seed)

    s_xyz = np.concatenate([
        xyz @ r_inst.T + t_off + rngc.normal(0, 0.001, xyz.shape).astype(np.float32),
        c_xyz,
    ])
    s_nrm = np.concatenate([nrm @ r_inst.T, c_nrm])
    s_tan = np.concatenate([tan @ r_inst.T, np.zeros_like(c_xyz)])
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = r_inst
    t_gt[:3, 3] = t_off
    return PointCloud.from_arrays(s_xyz, s_nrm, s_tan), t_gt


def run_one(cap: int, seeds: int, points: int):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.core.transforms import pose_delta
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import make_lattice_model
    from triplet_match_tpu.search.driver import find_all

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    policy = SearchPolicy()

    xyz, nrm, tan = make_lattice_model(cells=4, n_edge=20000, graded=True, seed=0)
    mp = cap if cap > 0 else xyz.shape[0] + 1
    t0 = time.perf_counter()
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample,
                          policy, max_pair_points=mp)
    jax.block_until_ready(model.keys)
    compile_s = time.perf_counter() - t0

    found, dts, drs, secs = 0, [], [], []
    for seed in range(seeds):
        scene, t_gt = build_scene((xyz, nrm, tan), points, seed)
        t1 = time.perf_counter()
        matches = find_all(
            model, scene, dist_thres=3.0, model_match_factor=0.5,
            sample_params=sample, discretization=disc, policy=policy,
            max_icp_iterations=10, seed=5,
        )
        secs.append(time.perf_counter() - t1)
        if matches:
            dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
            found += 1
            dts.append(float(dt) * 1000)
            drs.append(float(np.degrees(float(dr))))
    print(json.dumps({
        "max_pair_points": cap if cap > 0 else "full",
        "edge_points": int(xyz.shape[0]),
        "pair_table": int(model.pair_count),
        "model_compile_s": round(compile_s, 1),
        "found": found, "total": seeds,
        "max_translation_mm": round(max(dts), 4) if dts else None,
        "max_rotation_deg": round(max(drs), 4) if drs else None,
        "mean_search_s": round(float(np.mean(secs)), 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--caps", default="2048,4096,8192")
    ap.add_argument("--one", type=int, default=None)
    args = ap.parse_args()

    if args.one is not None:
        run_one(args.one, args.seeds, args.points)
        return
    for c in args.caps.split(","):
        res = subprocess.run([
            sys.executable, os.path.abspath(__file__), "--one", c.strip(),
            "--seeds", str(args.seeds), "--points", str(args.points),
        ])
        if res.returncode != 0:
            print(json.dumps({"max_pair_points": int(c), "FAILED": res.returncode}),
                  flush=True)


if __name__ == "__main__":
    main()
