"""Serving throughput/latency study for ``api.Matcher``.

The reference's demo app rebuilds everything per invocation
(/root/reference/apps/triplet_match.cpp:13-35); production users serve a
stream of scenes against one compiled model.  This script measures that
deployment loop end-to-end: one ``Matcher``, a stream of variable-size
touching-fog scenes (the recall-protocol generator), per-scene wall
latency.

Reported (one JSON line):
  * ``first_s``        — cold first scene (trace + compile, or AOT load)
  * ``p50_ms/p95_ms``  — warm per-scene latency across the stream
  * ``scenes_per_s``   — warm serving throughput
  * ``found/total``    — recall over the stream (every scene has one
                         planted instance; each must be recovered)
  * ``worst_mm/deg``   — worst pose error (modulo the box symmetry orbit)
  * ``programs``       — distinct compiled round programs used (bucket
                         reuse working = far fewer than distinct sizes)

Usage:
  python scripts/serving_bench.py                     # TPU, 131k-class
  python scripts/serving_bench.py --cpu --points 8192 --scenes 6
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=12,
                    help="number of scenes in the stream")
    ap.add_argument("--points", type=int, default=None,
                    help="nominal scene size (default 131072 TPU / 8192 CPU)")
    ap.add_argument("--vary", type=float, default=0.35,
                    help="size variation fraction — scene i draws its size "
                         "uniformly in [points*(1-vary), points*(1+vary)] so "
                         "the stream exercises capacity bucketing")
    ap.add_argument("--models", type=int, default=1,
                    help="serve a library of N box-variant models through "
                         "MultiMatcher (shared per-scene prep) instead of "
                         "a single-model Matcher")
    ap.add_argument("--warmup", action="store_true",
                    help="call matcher.warmup over the stream's bucket range "
                         "before timing (sparse + dense executable flavors) — "
                         "the deployment pattern the warmup API exists for; "
                         "warmup seconds are reported separately and the "
                         "stream then pays no first-compile cliff")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    if args.scenes < 2:
        # warm stats need at least one post-compile scene; never report the
        # cold first scene as warm latency
        ap.error("--scenes must be >= 2 (scene 0 pays trace+compile)")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # TPU-only: XLA:CPU cache blobs pin host machine features and can
        # SIGILL when reloaded cross-host (ROADMAP 3g / bench.py)
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    n_nominal = args.points or (131072 if on_tpu else 8192)

    from recall_study import build_scene
    from run_baseline_configs import _sym_delta

    from triplet_match_tpu.api import Matcher, Model, MultiMatcher
    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.io.synthetic import make_box_model
    from triplet_match_tpu.search import driver

    policy = SearchPolicy()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    disc = DiscretizationParams()

    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800,
                                   size=(1.0, 0.8, 0.6), seed=0)
    t0 = time.perf_counter()
    model = Model(PointCloud.from_arrays(xyz, nrm, tan), disc, policy).init(sample)
    # library mode: distinct box variants; only model 0's instance is
    # planted, so extra models exercise the shared-prep search cost while
    # recall stays measured against model 0
    extra_sizes = [(0.5, 0.5, 1.4), (1.3, 0.4, 0.4), (0.7, 0.7, 0.7)]
    extras = []
    for j in range(max(0, args.models - 1)):
        exyz, enrm, etan = make_box_model(
            n_edge=600, n_face=1800, size=extra_sizes[j % len(extra_sizes)],
            seed=10 + j)
        extras.append(Model(PointCloud.from_arrays(exyz, enrm, etan),
                            disc, policy).init(sample))
    compile_s = time.perf_counter() - t0

    min_cap = 16384 if on_tpu else 2048
    if args.models > 1:
        matcher = MultiMatcher([model, *extras], policy=policy,
                               min_capacity=min_cap)
    else:
        matcher = Matcher(model, policy=policy, min_capacity=min_cap)
    # hold every (bucket, model) program for the whole stream — the default
    # LRU bound would evict (and the "programs" metric would silently cap).
    # With --warmup each bucket carries TWO flavors (sparse + dense).
    driver.reserve_round_cache((8 if args.warmup else 4) * args.models)

    warmup_s = 0.0
    if args.warmup:
        lo = int(n_nominal * (1.0 - args.vary))
        hi = int(n_nominal * (1.0 + args.vary))
        t1 = time.perf_counter()
        warmed = matcher.warmup([lo, n_nominal, hi], model_match_factor=0.5,
                                sample_params=sample)
        warmup_s = time.perf_counter() - t1
        print(f"[serve] warmed buckets {warmed} in {warmup_s:.1f}s",
              file=sys.stderr)

    rng = np.random.default_rng(args.seed)
    lat = []
    found = 0
    worst_mm = 0.0
    worst_deg = 0.0
    buckets = set()
    for i in range(args.scenes):
        n_i = int(n_nominal * rng.uniform(1.0 - args.vary, 1.0 + args.vary))
        cloud, t_gt = build_scene(n_i, seed=i)
        buckets.add(matcher.bucket_capacity(cloud.capacity))
        t1 = time.perf_counter()
        matches = matcher.match(cloud, model_match_factor=0.5,
                                sample_params=sample, seed=13 + i)
        dt_s = time.perf_counter() - t1
        lat.append(dt_s)
        if args.models > 1:
            matches = matches[0]  # recall is measured against model 0
        ok = bool(matches)
        if ok:
            import jax.numpy as jnp

            d_mm, d_deg = _sym_delta(matches[0].transform, jnp.asarray(t_gt))
            worst_mm = max(worst_mm, float(d_mm) * 1000)
            worst_deg = max(worst_deg, float(d_deg))
            found += 1
        print(f"[serve] scene {i}: n={n_i} "
              f"cap={matcher.bucket_capacity(cloud.capacity)} "
              f"{dt_s:.2f}s found={ok}", file=sys.stderr)

    warm = sorted(lat[1:])
    p50 = warm[len(warm) // 2]
    p95 = warm[min(len(warm) - 1, int(len(warm) * 0.95))]
    print(json.dumps({
        "config": "serving_bench",
        "backend": jax.default_backend(),
        "models": args.models,
        "scenes": args.scenes,
        "nominal_points": n_nominal,
        "model_compile_s": round(compile_s, 2),
        "warmup": bool(args.warmup),
        "warmup_s": round(warmup_s, 2),
        "first_s": round(lat[0], 2),
        "p50_ms": round(p50 * 1000, 1),
        "p95_ms": round(p95 * 1000, 1),
        "scenes_per_s": round(len(warm) / sum(warm), 3),
        "found": found,
        "total": args.scenes,
        "worst_mm": round(worst_mm, 3),
        "worst_deg": round(worst_deg, 3),
        "capacity_buckets": sorted(buckets),
        "programs": len(driver._ROUND_FN_CACHE),
    }), flush=True)
    return 0 if found == args.scenes else 1


if __name__ == "__main__":
    raise SystemExit(main())
