"""Bisect the 4M execution fault (evidence_r4/scaling_r.log).

After the chunked finalist map removed the 34 GB compile OOM, the 4M round
executable compiles but faults at EXECUTION with a generic TPU device
error.  Prime suspect: program runtime — the 16-finalist join runs
scene-sized finish_find passes sequentially (chunked at fc=2 at 4M) and
single-device programs past ~2-3 min are known to fault on this tunnel
(ROADMAP 13).  This script runs ONE find_all at a given scene size with
the funnel width / ICP depth as knobs so the fault's dependence on join
length is a measurement:

    python scripts/diag_dense_fault.py --points 4194304 --finalists 4
    python scripts/diag_dense_fault.py --points 4194304 --finalists 8
    python scripts/diag_dense_fault.py --points 4194304 --finalists 16 --icp 3
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4194304)
    ap.add_argument("--finalists", type=int, default=16,
                    help="adaptive_finalists (fog-switch funnel width)")
    ap.add_argument("--icp", type=int, default=10, help="max_icp_iterations")
    ap.add_argument("--prescreen", type=int, default=None,
                    help="finalist_prescreen override (explicit policy values "
                         "win over find_all's fog-switch default; -1 disables "
                         "the prescreen by matching the funnel width)")
    ap.add_argument("--tight", type=int, default=None,
                    help="tight_icp_iterations override")
    ap.add_argument("--tight-edges", choices=["on", "off"], default=None,
                    help="tight_edges_only override (None = fog-switch auto)")
    ap.add_argument("--tight-p2l", choices=["on", "off"], default=None,
                    help="tight_point_to_line override (None = fog-switch auto)")
    ap.add_argument("--raw-tangents", choices=["on", "off"], default=None,
                    help="scene_raw_tangents override (None = fog-switch auto)")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
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
    from triplet_match_tpu.search import driver

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    policy = SearchPolicy(adaptive_finalists=args.finalists)
    if args.prescreen is not None:
        pre = args.finalists if args.prescreen < 0 else args.prescreen
        policy = dataclasses.replace(policy, finalist_prescreen=pre)
    if args.tight is not None:
        policy = dataclasses.replace(policy, tight_icp_iterations=args.tight)
    if args.tight_edges is not None:
        policy = dataclasses.replace(policy,
                                     tight_edges_only=args.tight_edges == "on")
    if args.tight_p2l is not None:
        policy = dataclasses.replace(policy,
                                     tight_point_to_line=args.tight_p2l == "on")
    if args.raw_tangents is not None:
        policy = dataclasses.replace(policy,
                                     scene_raw_tangents=args.raw_tangents == "on")
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)

    scene, t_gt = build_scene(args.points, args.seed)
    t0 = time.perf_counter()
    prep = driver.prepare_scene(scene, policy)
    jax.block_until_ready(prep.tangent_mask)
    prep_s = time.perf_counter() - t0

    # NB key name: LAST_SEARCH_STATS carries its own "finalists" counter
    # (total finalists processed across rounds) which row.update would
    # overwrite this arg with
    import jax.numpy as jnp

    raw_edges = int(jnp.sum(
        (jnp.linalg.norm(scene.tangent, axis=-1) > 0.7) & prep.cloud.valid))
    row = {"config": "diag_dense_fault", "points": args.points,
           "funnel": args.finalists, "icp": args.icp, "tight": args.tight,
           "seed": args.seed, "prepare_s": round(prep_s, 2),
           # detection starvation diagnostic: acceptance needs
           # score_t >= 0.5 * model n_edge DETECTED tangent corrs; dense
           # fog contaminates the curvature gate's neighborhoods, so the
           # detected count falls with density while the raw count stays
           "scene_n_edge_detected": int(prep.n_edge),
           "scene_n_edge_raw": raw_edges}
    t0 = time.perf_counter()
    try:
        m = driver.find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                            sample_params=sample, discretization=disc,
                            policy=policy, max_icp_iterations=args.icp, seed=5,
                            prep=prep)
    except Exception as e:  # record how long execution ran before the fault
        row.update(FAILED=1, fail_s=round(time.perf_counter() - t0, 2),
                   error=str(e).splitlines()[0][:200])
        print(json.dumps(row), flush=True)
        raise
    row["search_s"] = round(time.perf_counter() - t0, 2)
    row["found"] = len(m)
    if m:
        d_mm, d_deg = _sym_delta(m[0].transform, t_gt)
        row["translation_mm"] = round(float(d_mm) * 1000, 3)
        row["rotation_deg"] = round(float(d_deg), 3)
    stats = dict(driver.LAST_SEARCH_STATS)
    stats.pop("profile", None)
    row.update({k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in stats.items() if not isinstance(v, (list, dict))})
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
