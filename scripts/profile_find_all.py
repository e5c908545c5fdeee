"""Where do end-to-end search seconds go?  Round/phase breakdown on the
recall-protocol scene.

The kernel benches at ~10.7M poses/s, yet recall131k_v2 measured 18.4 s
mean search and the serving stream p50 ~15 s — end-to-end is rounds x
round_ms plus the no-match confirmation phase over leftover fog.  This
script runs ``find_all`` on recall scenes (cold then warm) and prints the
driver's LAST_SEARCH_STATS (phases, rounds, hypotheses, round_ms_avg,
profiler report) so the expensive term is a fact, not a guess.

    python scripts/profile_find_all.py [--points 131072] [--seeds 2] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--first-seed", type=int, default=0,
                    help="scene seeds run [first_seed, first_seed+seeds) — "
                         "scaling_study uses seeds 1,2; recall_study 0..9")
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
    policy = SearchPolicy()
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)

    for seed in range(args.first_seed, args.first_seed + args.seeds):
        scene, t_gt = build_scene(args.points, seed)
        t0 = time.perf_counter()
        prep = driver.prepare_scene(scene, policy)
        jax.block_until_ready(prep.tangent_mask)
        prep_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        m = driver.find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                            sample_params=sample, discretization=disc,
                            policy=policy, max_icp_iterations=10, seed=5,
                            prep=prep)
        search_s = time.perf_counter() - t0
        stats = dict(driver.LAST_SEARCH_STATS)
        prof = stats.pop("profile", None)
        dt, dr = (None, None)
        if m:
            d_mm, d_deg = _sym_delta(m[0].transform, t_gt)
            dt, dr = round(float(d_mm) * 1000, 3), round(float(d_deg), 3)
        print(json.dumps({
            "config": "profile_find_all",
            "backend": jax.default_backend(),
            "points": args.points,
            "seed": seed,
            "prepare_s": round(prep_s, 2),
            "search_s": round(search_s, 2),
            "found": len(m),
            "translation_mm": dt,
            "rotation_deg": dr,
            **{k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in stats.items()},
            "profile": prof,
        }), flush=True)


if __name__ == "__main__":
    main()
