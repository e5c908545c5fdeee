"""Throughput sweep of two-phase scorer settings on the bench shapes.

Times score_groups_two_phase on the standard bench workload (G=256 groups x
Hg=512 poses x K=512 neighborhoods, 2.4k-pt box model) across a grid of
(coarse_model, stride, keep_frac, pose_tile) and prints one JSON line per
setting.  Pair with scripts/recall_study.py before flipping any default:
this file answers "how fast", that one answers "does it still find it".

    python scripts/sweep_two_phase.py [--settings coarse:8:16:16,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--settings",
        default="exact:8:16:16,coarse:8:16:16,coarse:8:16:32,coarse:8:32:16,"
                "coarse:16:16:16,coarse:16:32:32",
        help="comma list of <coarse|exact>:<stride>:<keep_frac>:<pose_tile>[:<fine_stride>]",
    )
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import prepare_scene
    from triplet_match_tpu.search.score_pallas import (
        pack_groups, pack_model, poses_to_rows, score_groups_two_phase,
    )

    G, HG, K = 256, 512, 512
    n_scene = 131072
    policy = SearchPolicy()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan),
                          DiscretizationParams(), sample, policy)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001,
                                    n_clutter=n_scene - xyz.shape[0],
                                    clutter_extent=6.0, seed=3)
    prep = prepare_scene(scene, policy)

    rng = np.random.default_rng(0)
    t_inv = np.linalg.inv(np.asarray(t_gt)).astype(np.float32)
    ts = np.tile(t_inv, (G, HG, 1, 1))
    ts[..., :3, 3] += rng.normal(0, 0.5, (G, HG, 3)).astype(np.float32)
    nbr_idx = jnp.asarray(rng.integers(0, n_scene, (G, K)).astype(np.int32))
    nbr_valid = jnp.ones((G, K), bool)
    consumed = jnp.zeros(prep.cloud.xyz.shape[0], bool)
    thres = 3.0 * float(model.resolution)

    mpack = pack_model(model, coarse_points=policy.coarse_model_points)
    groups = pack_groups(prep.cloud, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(jnp.asarray(ts))

    for s in args.settings.split(","):
        parts = s.strip().split(":")
        kind, stride, keep, pt = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
        fine = int(parts[4]) if len(parts) > 4 else 1

        def run():
            return score_groups_two_phase(
                mpack, groups, rows, thres * thres, mode="count",
                pose_tile=pt, coarse_stride=stride, keep_frac=keep,
                coarse_model=(kind == "coarse"), fine_stride=fine,
            )

        out = run()
        jax.block_until_ready(out)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "setting": s.strip(),
            "poses_per_sec": round(G * HG / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
