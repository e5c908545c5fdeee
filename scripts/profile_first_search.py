"""Stage-split profile of the FIRST search in a fresh process (the cliff).

RESULTS_r2 measured 25-35 s for the first ``find_all`` at 131k-1M points
vs 1.2-4.8 s steady (VERDICT r2 weak #1).  This script times every stage
of the cold path in a fresh process with the persistent XLA cache WARM, and
splits the round executable's cost into trace (jit -> lower), backend
compile (lower -> compile), and first execution:

    python scripts/profile_first_search.py [--points 131072]

One JSON line per stage.  Run once to warm the cache, read the second run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def stamp(stage, t_start):
    dt = time.perf_counter() - t_start
    print(json.dumps({"stage": stage, "s": round(dt, 2)}), flush=True)
    return time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    args = ap.parse_args()

    t = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from functools import partial

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search import score_pallas as sp
    from triplet_match_tpu.search.driver import find_all, prepare_scene, search_round

    t = stamp("imports", t)

    policy = SearchPolicy()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    disc = DiscretizationParams()
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)
    jax.block_until_ready(model.keys)
    t = stamp("model_compile", t)

    scene, t_gt, _ = embed_in_scene(
        xyz, nrm, tan, noise=0.001, n_clutter=args.points - xyz.shape[0],
        clutter_extent=6.0, seed=3,
    )
    t = stamp("scene_build_host", t)

    prep = prepare_scene(scene, policy)
    jax.block_until_ready(prep.tangent_mask)
    t = stamp("prepare_scene", t)

    # match find_all's pack EXACTLY (fine_points included): md_fine's shape
    # is part of the round's jit/AOT signature, so packing with a different
    # fine block would trace+warm a non-production executable and the
    # find_all_after_warm stage would silently pay a full compile
    mpack = sp.pack_model(model, coarse_points=policy.coarse_model_points,
                          fine_points=policy.fine_model_points)
    jax.block_until_ready(mpack.md_coarse)
    t = stamp("pack_model", t)

    n = prep.cloud.xyz.shape[0]
    consumed = jnp.zeros(n, bool)
    fp = jnp.zeros(n, bool)
    key = jax.random.PRNGKey(13)
    round_jit = jax.jit(partial(
        search_round, discretization=disc, sample_params=sample, policy=policy,
        max_icp_iterations=10,
    ))
    args_r = (model, prep, consumed, fp, key, jnp.float32(3.0),
              jnp.float32(0.5), mpack)
    lowered = round_jit.lower(*args_r)
    t = stamp("round_trace", t)
    compiled = lowered.compile()
    t = stamp("round_backend_compile", t)
    out = compiled(*args_r)
    jax.block_until_ready(out[0].accept)
    t = stamp("round_first_execute", t)
    out = compiled(*args_r)
    jax.block_until_ready(out[0].accept)
    t = stamp("round_steady_execute", t)

    t1 = time.perf_counter()
    matches = find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                       sample_params=sample, discretization=disc, policy=policy,
                       max_icp_iterations=10, seed=5, prep=prep)
    stamp("find_all_after_warm", t1)
    print(json.dumps({"stage": "total_from_import", "s": round(time.perf_counter() - T0, 2),
                      "matches": len(matches)}), flush=True)


if __name__ == "__main__":
    main()
