"""1M-point raycast verification: pruned vs brute timing + mask parity.

VERDICT r2 item 10 evidence: the cone-and-range occluder cull
(triplet_match_tpu/verify/raycast.py) must make ``cast_visibility`` >= 5x
faster at 1M scene points with IDENTICAL masks vs the brute O(M*N) sweep —
the OptiX BVH broad-phase analog (/root/reference/raycaster.ipp:1-121).

    python scripts/raycast_bench.py [--scene-points 1048576] [--origins 4]

Prints one JSON line with per-variant seconds and the speedup.  Timing
rotates across distinct pose jitters per iteration (constant-input loops
are unreliable through the remote tunnel — ROADMAP 3d3).
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
    ap.add_argument("--scene-points", type=int, default=1048576)
    ap.add_argument("--origins", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from triplet_match_tpu.io.synthetic import make_box_model
    from triplet_match_tpu.verify.raycast import cast_visibility_multi

    # model instance embedded off-center in a big uniform scene; cameras on
    # a shell looking at the scene center — the production configuration of
    # run_baseline_configs config 5
    xyz, _, _ = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    rng = np.random.default_rng(7)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = (1.5, -0.8, 0.4)
    scene = rng.uniform(-4, 4, (args.scene_points, 3)).astype(np.float32)
    svalid = np.ones(args.scene_points, bool)
    mvalid = np.ones(xyz.shape[0], bool)
    origins = np.array(
        [[8, 0, 0], [0, 8, 0], [-8, 0, 2], [0, -8, 2]], np.float32
    )[: args.origins]

    model_j = jnp.asarray(xyz)
    mvalid_j = jnp.asarray(mvalid)
    scene_j = jnp.asarray(scene)
    svalid_j = jnp.asarray(svalid)

    # rotated pose jitters (distinct inputs per timing iteration)
    ts = []
    for i in range(args.iters):
        tj = t.copy()
        tj[:3, 3] += rng.normal(0, 0.01, 3).astype(np.float32)
        ts.append(jnp.asarray(tj))

    results = {}
    masks = {}
    for name, prune in (("brute", False), ("pruned", True)):
        # warm (compile) pass
        v = cast_visibility_multi(origins, model_j, mvalid_j, ts[0], scene_j,
                                  svalid_j, point_radius=0.02,
                                  depth_tolerance=0.01, prune=prune)
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        vs = []
        for tj in ts:
            v = cast_visibility_multi(origins, model_j, mvalid_j, tj, scene_j,
                                      svalid_j, point_radius=0.02,
                                      depth_tolerance=0.01, prune=prune)
            jax.block_until_ready(v)
            vs.append(np.asarray(v))
        results[name] = (time.perf_counter() - t0) / args.iters
        masks[name] = vs

    identical = all(
        np.array_equal(a, b) for a, b in zip(masks["brute"], masks["pruned"])
    )
    print(json.dumps({
        "scene_points": args.scene_points,
        "model_points": int(xyz.shape[0]),
        "origins": args.origins,
        "brute_s": round(results["brute"], 4),
        "pruned_s": round(results["pruned"], 4),
        "speedup": round(results["brute"] / results["pruned"], 2),
        "masks_identical": bool(identical),
        "visible_frac": round(float(np.mean(masks["pruned"][0])), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
