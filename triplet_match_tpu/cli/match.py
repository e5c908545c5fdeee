"""CLI: find rigid instances of a model cloud inside a scene cloud.

Working replacement for the reference's stale demo app
(/root/reference/apps/triplet_match.cpp — written against a long-gone API
and excluded from its own build, CMakeLists.txt:26).  Usage:

    python -m triplet_match_tpu.cli.match model.pcd scene.pcd \
        [--dist-thres 3.0] [--model-match-factor 0.4] [--seed 13] \
        [--distance-steps 20] [--angle-step-deg 10] \
        [--min-diameter-factor 0.3] [--max-diameter-factor 0.95] \
        [--max-icp 10] [--save-model model.npz] [--out matches.json] \
        [--dp N] [--sp N] [--dcn N] [--host-devices N]

Multi-chip: ``--dp`` runs per-chip RANSAC chunks with an ICI finalist
join, ``--sp`` additionally shards every scene array (the capacity is
padded automatically), ``--dcn`` adds a multi-slice axis with a
hierarchical ICI-then-DCN join.  ``--host-devices N --cpu`` tests any
mesh layout on one machine with virtual devices.

The demo app's discretization {0.05 distance fraction, 10 deg}
(apps/triplet_match.cpp:17-20) maps to --distance-steps 20 --angle-step-deg 10.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="triplet_match_tpu.cli.match",
        description="Rigid model-in-scene point cloud matching (TPU-native).",
    )
    p.add_argument("model_pcd", help="model point cloud (.pcd) or compiled model (.npz)")
    p.add_argument("scene_pcd", help="scene point cloud (.pcd)")
    p.add_argument("--dist-thres", type=float, default=3.0,
                   help="correspondence threshold in multiples of model resolution")
    p.add_argument("--model-match-factor", type=float, default=0.4)
    p.add_argument("--early-out-factor", type=float, default=0.9)
    p.add_argument("--max-icp", type=int, default=10)
    p.add_argument("--seed", type=int, default=13)
    p.add_argument("--distance-steps", type=int, default=20)
    p.add_argument("--angle-step-deg", type=float, default=10.0)
    p.add_argument("--min-diameter-factor", type=float, default=0.3)
    p.add_argument("--max-diameter-factor", type=float, default=0.95)
    p.add_argument("--force-up", action="store_true")
    p.add_argument("--estimate-tangents", action="store_true",
                   help="derive edge tangents geometrically (normal x pc_max_dir) "
                        "for clouds that lack tangent fields")
    p.add_argument("--save-model", help="serialize the compiled model index (.npz)")
    p.add_argument("--out", help="write matches as JSON")
    p.add_argument("--profile-dir", help="capture a jax.profiler device trace of the search")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh axis: each of N chips RANSACs its "
                        "own hypothesis chunk (parallel/search.py)")
    p.add_argument("--sp", type=int, default=1,
                   help="scene-sharding mesh axis: scene arrays split across "
                        "N chips (parallel/search2d.py); the scene capacity "
                        "is padded to a multiple automatically")
    p.add_argument("--dcn", type=int, default=1,
                   help="multi-slice mesh axis with a hierarchical "
                        "ICI-then-DCN finalist join")
    p.add_argument("--host-devices", type=int,
                   help="force N virtual host devices (CPU mesh testing; "
                        "must be set before the first jax import)")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.host_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.host_devices}"
        )

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # TPU: the remote compile service has erratic latency (30s-15min
        # for identical programs) — always run through the persistent cache
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")

    import numpy as np

    from triplet_match_tpu.api import Model, Scene
    from triplet_match_tpu.config import DiscretizationParams, SampleParams
    from triplet_match_tpu.io.pcd import read_pcd
    from triplet_match_tpu.utils.progress import ProgressBar

    log = (lambda *a: None) if args.quiet else (lambda *a: print(*a, file=sys.stderr))

    disc = DiscretizationParams(
        distance_step_count=args.distance_steps,
        angle_step=math.radians(args.angle_step_deg),
    )
    sample = SampleParams(
        min_diameter_factor=args.min_diameter_factor,
        max_diameter_factor=args.max_diameter_factor,
        force_up=args.force_up,
    )

    def maybe_estimate(cloud, what):
        import dataclasses as _dc

        if not args.estimate_tangents:
            return cloud
        from triplet_match_tpu.ops.curvature import estimate_edge_tangents

        import jax.numpy as _jnp

        est = estimate_edge_tangents(cloud, k=30)
        n_est = int((_jnp.linalg.norm(est, axis=-1) > 0.5).sum())
        log(f"{what}: estimated tangents for {n_est} edge points")
        return _dc.replace(cloud, tangent=est)

    t0 = time.perf_counter()
    if args.model_pcd.endswith(".npz"):
        model = Model.load(args.model_pcd, disc)
        log(f"loaded compiled model: {args.model_pcd}")
    else:
        model_cloud = maybe_estimate(read_pcd(args.model_pcd), "model")
        log(f"model: {int(model_cloud.count())} points")
        model = Model(model_cloud, disc).init(sample)
    log(f"model ready in {time.perf_counter() - t0:.2f}s: "
        f"diameter={model.diameter():.4f} resolution={model.resolution():.5f} "
        f"edge_points={model.point_count()} pairs={model.pair_count()}")
    if args.save_model:
        model.save(args.save_model)
        log(f"compiled model saved to {args.save_model}")

    mesh = None
    if args.dcn * args.dp * args.sp > 1:
        if args.dcn > 1:
            from triplet_match_tpu.parallel.search2d import make_mesh_3d

            mesh = make_mesh_3d(args.dcn, args.dp, args.sp)
        elif args.sp > 1:
            from triplet_match_tpu.parallel.search2d import make_mesh_2d

            mesh = make_mesh_2d(args.dp, args.sp)
        else:
            from triplet_match_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.dp)
        log(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} devices")

    scene_cloud = maybe_estimate(read_pcd(args.scene_pcd), "scene")
    if args.sp > 1:
        from triplet_match_tpu.core.cloud import pad_capacity

        scene_cloud = pad_capacity(scene_cloud, args.sp)
    log(f"scene: {int(scene_cloud.count())} points")
    scene = Scene(scene_cloud)

    bar = None if args.quiet else ProgressBar(prefix="search ")
    t1 = time.perf_counter()

    import contextlib

    from triplet_match_tpu.utils.trace import device_trace

    tracer = device_trace(args.profile_dir) if args.profile_dir else contextlib.nullcontext()
    with tracer:
        matches = scene.find_all_parallel(
            model,
            dist_thres=args.dist_thres,
            model_match_factor=args.model_match_factor,
            early_out_factor=args.early_out_factor,
            sample_params=sample,
            max_icp_iterations=args.max_icp,
            seed=args.seed,
            mesh=mesh,
            progress=bar.poll if bar else None,
        )
    if args.profile_dir:
        log(f"device trace written to {args.profile_dir}")
    dt = time.perf_counter() - t1
    if bar:
        bar.finish()

    st = scene.statistics
    log(f"search: {len(matches)} match(es) in {dt:.2f}s "
        f"({st.rounds} rounds, {st.hypotheses_scored} hypotheses, "
        f"rejection_rate={st.rejection_rate:.3f})")

    out = []
    for i, m in enumerate(matches):
        out.append({
            "transform": np.asarray(m.transform).tolist(),
            "scene_corr_count": int(len(m.scene_corrs)),
            "signed_score": m.signed_score,
        })
        log(f"match {i}: corrs={len(m.scene_corrs)} score={m.signed_score:.4f}")
        log(np.array_str(np.asarray(m.transform), precision=5, suppress_small=True))

    payload = json.dumps({"matches": out, "elapsed_sec": dt}, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
    else:
        print(payload)
    return 0 if matches else 2


if __name__ == "__main__":
    sys.exit(main())
