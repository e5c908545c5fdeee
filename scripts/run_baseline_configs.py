"""Full-scale BASELINE.json acceptance configs on TPU hardware.

Runs the five configs at their stated sizes (10k / 100k / 500k / 1M points)
and prints one JSON line per config with pose error, timings, and
throughput.  Usage:

    python scripts/run_baseline_configs.py [--configs 1,2,3] [--small]

``--small`` shrinks sizes ~10x for a quick smoke run.  Tests at CPU scale
live in tests/test_baseline_configs.py; this script is the hardware-scale
evidence run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup_jax():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    return jax


def _emit(name, **kw):
    print(json.dumps({"config": name, **{k: (round(v, 5) if isinstance(v, float) else v) for k, v in kw.items()}}), flush=True)


def config1_plane(small):
    import jax
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.io.synthetic import make_plane_patch, rotation_matrix
    from triplet_match_tpu.primitives.detect import detect_plane

    n_plane, n_clut = (6000, 4000) if not small else (600, 400)
    rng = np.random.default_rng(42)
    pxyz, pn, _ = make_plane_patch(n=n_plane, size=(2.0, 2.0), seed=1)
    r = rotation_matrix([0.4, 1.0, 0.2], 0.7)
    pxyz = (pxyz @ r.T + np.array([0.3, -0.5, 1.2], np.float32))
    pxyz += rng.normal(0, 0.002, pxyz.shape).astype(np.float32)
    clutter = rng.uniform(-3, 3, (n_clut, 3)).astype(np.float32)
    cn = rng.normal(size=(n_clut, 3)).astype(np.float32)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    cloud = PointCloud.from_arrays(np.concatenate([pxyz, clutter]), np.concatenate([pn @ r.T, cn]))
    t0 = time.perf_counter()
    det = detect_plane(cloud, key=jax.random.PRNGKey(0), num_hypotheses=256, threshold=0.01)
    inl = np.asarray(det.inliers)
    _emit("1_plane_10k", points=int(cloud.capacity), plane_recall=float(inl[:n_plane].mean()),
          clutter_rate=float(inl[n_plane:].mean()), seconds=time.perf_counter() - t0)


def config2_cylinder(small):
    import jax
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.io.synthetic import make_cylinder, rotation_matrix
    from triplet_match_tpu.primitives.detect import detect_cylinder

    n_cyl, n_clut = (8000, 4000) if not small else (800, 400)
    rng = np.random.default_rng(7)
    cxyz, cn, _ = make_cylinder(n=n_cyl, radius=0.35, height=1.5, seed=2, rim_edges=False)
    r = rotation_matrix([1, 0.3, 0.5], 1.3)
    x = (cxyz @ r.T + np.array([0.5, 1.0, -0.2], np.float32))
    x += rng.normal(0, 0.002, x.shape).astype(np.float32)
    clutter = rng.uniform(-3, 3, (n_clut, 3)).astype(np.float32)
    kn = rng.normal(size=(n_clut, 3)).astype(np.float32)
    kn /= np.linalg.norm(kn, axis=1, keepdims=True)
    cloud = PointCloud.from_arrays(np.concatenate([x, clutter]), np.concatenate([cn @ r.T, kn]))
    t0 = time.perf_counter()
    det = detect_cylinder(cloud, key=jax.random.PRNGKey(1), num_hypotheses=512, threshold=0.015)
    _emit("2_cylinder", points=int(cloud.capacity), radius=float(det.state.radius),
          radius_err=abs(float(det.state.radius) - 0.35),
          recall=float(np.asarray(det.inliers)[:n_cyl].mean()),
          seconds=time.perf_counter() - t0)


def _match_config(name, n_clutter, small, *, raycast=False, icp=10, multi=False,
                  mmf=0.5):
    import jax
    import jax.numpy as jnp

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.core.transforms import pose_delta
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model, rotation_matrix
    from triplet_match_tpu.search.driver import find_all, find_all_multi, prepare_scene

    if small:
        n_clutter //= 10
    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    policy = SearchPolicy()

    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    tc0 = time.perf_counter()
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)
    jax.block_until_ready(model.keys)
    t_compile = time.perf_counter() - tc0

    # clutter as scattered surface patches (real scans are surfaces, not
    # volumetric fog — uniform volume clutter makes raycast verification
    # physically meaningless because every ray is fogged out)
    rngc = np.random.default_rng(17)
    from triplet_match_tpu.io.synthetic import make_plane_patch

    patches = []
    n_per = 2000
    n_patches = max(n_clutter // n_per, 1)
    for i in range(n_patches):
        pxyz, pn, _ = make_plane_patch(n=n_per, size=(1.5, 1.5), seed=100 + i,
                                       border_edges=False)
        rr = rotation_matrix(rngc.normal(size=3), rngc.uniform(0, np.pi))
        tt = rngc.uniform(-5, 5, 3).astype(np.float32)
        # clearance ball: patches (half-extent ~1.06) must not reach the
        # instance at the origin (box half-diagonal ~0.71)
        norm = np.linalg.norm(tt)
        if norm < 2.2:
            tt = tt / max(norm, 1e-6) * rngc.uniform(2.2, 5.0)
        patches.append(((pxyz @ rr.T + tt).astype(np.float32), (pn @ rr.T).astype(np.float32)))
    c_xyz = np.concatenate([p[0] for p in patches])[: n_clutter]
    c_nrm = np.concatenate([p[1] for p in patches])[: n_clutter]

    inst = rotation_matrix([0.3, 1.0, 0.2], 1.1)
    inst_t = np.array([0.0, 0.0, 0.0], np.float32)
    s_xyz = np.concatenate([xyz @ inst.T + inst_t + rngc.normal(0, 0.001, xyz.shape).astype(np.float32), c_xyz])
    s_nrm = np.concatenate([nrm @ inst.T, c_nrm])
    s_tan = np.concatenate([tan @ inst.T, np.zeros_like(c_xyz)])
    t_gt = np.eye(4, dtype=np.float32); t_gt[:3, :3] = inst; t_gt[:3, 3] = inst_t
    scene = PointCloud.from_arrays(s_xyz, s_nrm, s_tan)
    tp0 = time.perf_counter()
    prep = prepare_scene(scene, policy)
    jax.block_until_ready(prep.tangent_mask)
    t_prep = time.perf_counter() - tp0

    kwargs = dict(dist_thres=3.0, model_match_factor=mmf, sample_params=sample,
                  discretization=disc, policy=policy, max_icp_iterations=icp, seed=5)
    ts0 = time.perf_counter()
    if multi:
        # origins inside the clutter-free clearance ball: verification then
        # measures self/near occlusion rather than unrelated far fog
        origins = np.array([[1.8, 0, 0.6], [-1.8, 0, 0.6], [0, 1.8, 0.6], [0, -1.8, 0.6]], np.float32)
        # annotate cast scores without dropping (threshold choice is
        # scene-dependent; the score itself is the verification evidence)
        results = find_all_multi([model], scene, raycast_origins=origins if raycast else None,
                                 min_cast_score=None, **kwargs)
        matches = results[0]
    else:
        matches = find_all(model, scene, prep=prep, **kwargs)
    t_search = time.perf_counter() - ts0

    if matches:
        # the synthetic box has a {I, Rx(pi), Ry(pi), Rz(pi)} symmetry group:
        # symmetric poses are geometrically identical matches (pair features
        # cannot distinguish them — true for the reference as well), so
        # report the delta against the best symmetry-equivalent ground truth
        best = (np.inf, np.inf)
        from triplet_match_tpu.io.synthetic import rotation_matrix

        for axis in [None, [1, 0, 0], [0, 1, 0], [0, 0, 1]]:
            tg = np.asarray(t_gt).copy()
            if axis is not None:
                tg[:3, :3] = tg[:3, :3] @ rotation_matrix(axis, np.pi)
            dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(tg))
            dt, dr = float(dt), float(np.degrees(float(dr)))
            # combined metric: 1 deg of rotation ~ diameter/100 of translation
            if dt + 0.01 * dr < best[0] + 0.01 * best[1]:
                best = (dt, dr)
        _emit(name, scene_points=int(scene.capacity), matches=len(matches),
              translation_mm=best[0] * 1000, rotation_deg=best[1],
              cast_score=matches[0].cast_score,
              compile_s=t_compile, prepare_s=t_prep, search_s=t_search)
    else:
        _emit(name, scene_points=int(scene.capacity), matches=0,
              compile_s=t_compile, prepare_s=t_prep, search_s=t_search)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--no-isolate", action="store_true",
                    help="run all configs in this process (default: one subprocess per config — the TPU runtime degrades after a large program)")
    args = ap.parse_args()
    wanted = sorted({int(c) for c in args.configs.split(",")})

    if not args.no_isolate and len(wanted) > 1:
        import subprocess

        for c in wanted:
            cmd = [sys.executable, os.path.abspath(__file__), "--configs", str(c),
                   "--no-isolate"] + (["--small"] if args.small else [])
            res = subprocess.run(cmd)
            if res.returncode != 0:
                _emit(f"{c}_FAILED", returncode=res.returncode)
        return

    _setup_jax()
    wanted = set(wanted)

    if 1 in wanted:
        config1_plane(args.small)
    if 2 in wanted:
        config2_cylinder(args.small)
    if 3 in wanted:
        _match_config("3_rigid_100k", 100_000 - 2400, args.small)
    if 4 in wanted:
        # heavy clutter contaminates scene curvature neighborhoods, dropping
        # scene edge recall (~0.6 at these densities; the reference's fixed
        # curvature_k would see the same), so the edge-corr acceptance gate
        # needs a lower match factor — the reference demo itself used 0.2
        # (apps/triplet_match.cpp:25)
        _match_config("4_icp_500k", 500_000 - 2400, args.small, icp=15, mmf=0.4)
    if 5 in wanted:
        _match_config("5_raycast_1m", 1_000_000 - 2400, args.small, raycast=True,
                      multi=True, mmf=0.3)


if __name__ == "__main__":
    main()
