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


def _sym_delta(transform, t_gt):
    """Pose delta against the best box-symmetry-equivalent ground truth.

    The synthetic box has a {I, Rx(pi), Ry(pi), Rz(pi)} symmetry group:
    symmetric poses are geometrically identical matches (pair features
    cannot distinguish them — true for the reference as well).
    """
    import jax.numpy as jnp

    from triplet_match_tpu.core.transforms import pose_delta
    from triplet_match_tpu.io.synthetic import rotation_matrix

    best = (np.inf, np.inf)
    for axis in [None, [1, 0, 0], [0, 1, 0], [0, 0, 1]]:
        tg = np.asarray(t_gt).copy()
        if axis is not None:
            tg[:3, :3] = tg[:3, :3] @ rotation_matrix(axis, np.pi)
        dt, dr = pose_delta(jnp.asarray(transform), jnp.asarray(tg))
        dt, dr = float(dt), float(np.degrees(float(dr)))
        # combined metric: 1 deg of rotation ~ diameter/100 of translation
        if dt + 0.01 * dr < best[0] + 0.01 * best[1]:
            best = (dt, dr)
    return best


def _match_config(name, n_clutter, small, *, raycast=False, icp=10, multi=False,
                  mmf=0.5, two_models=False, policy_overrides=None):
    import dataclasses

    import jax

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import make_box_model, rotation_matrix
    from triplet_match_tpu.search.driver import find_all, find_all_multi, prepare_scene

    if small:
        n_clutter //= 10
    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    policy = SearchPolicy()
    if policy_overrides:
        policy = dataclasses.replace(policy, **policy_overrides)

    # model A always; model B (a differently-proportioned box) for the
    # genuine multi-model config
    specs = [((1.0, 0.8, 0.6), 0, np.array([0.0, 0.0, 0.0], np.float32),
              rotation_matrix([0.3, 1.0, 0.2], 1.1))]
    if two_models:
        specs.append(((1.3, 0.45, 0.85), 50, np.array([2.6, 2.4, 0.3], np.float32),
                      rotation_matrix([0.9, -0.2, 0.4], 2.0)))

    tc0 = time.perf_counter()
    models, insts = [], []
    for size, seed, t_off, r_inst in specs:
        xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=size, seed=seed)
        m = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)
        jax.block_until_ready(m.keys)
        models.append(m)
        insts.append((xyz, nrm, tan, t_off, r_inst))
    t_compile = time.perf_counter() - tc0

    # clutter as scattered surface patches (real scans are surfaces, not
    # volumetric fog — uniform volume clutter makes raycast verification
    # physically meaningless because every ray is fogged out); see
    # io.synthetic.fog_patches for the touching-clutter semantics
    rngc = np.random.default_rng(17)
    from triplet_match_tpu.io.synthetic import fog_patches

    c_xyz, c_nrm = fog_patches(rngc, n_clutter, seed_base=100)

    s_parts_xyz, s_parts_nrm, s_parts_tan, t_gts = [], [], [], []
    for xyz, nrm, tan, t_off, r_inst in insts:
        s_parts_xyz.append(xyz @ r_inst.T + t_off
                           + rngc.normal(0, 0.001, xyz.shape).astype(np.float32))
        s_parts_nrm.append(nrm @ r_inst.T)
        s_parts_tan.append(tan @ r_inst.T)
        tg = np.eye(4, dtype=np.float32)
        tg[:3, :3] = r_inst
        tg[:3, 3] = t_off
        t_gts.append(tg)
    s_xyz = np.concatenate(s_parts_xyz + [c_xyz])
    s_nrm = np.concatenate(s_parts_nrm + [c_nrm])
    s_tan = np.concatenate(s_parts_tan + [np.zeros_like(c_xyz)])
    scene = PointCloud.from_arrays(s_xyz, s_nrm, s_tan)
    tp0 = time.perf_counter()
    prep = prepare_scene(scene, policy)
    jax.block_until_ready(prep.tangent_mask)
    t_prep = time.perf_counter() - tp0

    kwargs = dict(dist_thres=3.0, model_match_factor=mmf, sample_params=sample,
                  discretization=disc, policy=policy, max_icp_iterations=icp, seed=5)
    ts0 = time.perf_counter()
    if multi:
        origins = np.array([[1.8, 0, 0.6], [-1.8, 0, 0.6], [0, 1.8, 0.6],
                            [0, -1.8, 0.6], [2.6, 2.4, 2.2]], np.float32)
        # annotate cast scores without dropping (threshold choice is
        # scene-dependent; the score itself is the verification evidence)
        results = find_all_multi(models, scene,
                                 raycast_origins=origins if raycast else None,
                                 min_cast_score=None, **kwargs)
    else:
        results = [find_all(models[0], scene, prep=prep, **kwargs)]
    t_search = time.perf_counter() - ts0

    if multi:
        # per-model attribution rows (VERDICT r4 weak #5: config-5's 477 s
        # had no breakdown): search/raycast seconds, round counts, the
        # executable-resolution profile sections, per model
        from triplet_match_tpu.search.driver import LAST_MULTI_SEARCH_STATS

        for i, st in enumerate(LAST_MULTI_SEARCH_STATS):
            _emit(f"{name}_stats{chr(65 + i)}", **{
                k: st.get(k) for k in (
                    "search_s", "raycast_s", "rounds", "phases", "finalists",
                    "accepted", "hypotheses_scored",
                    "num_second_samples_effective", "fine_rescore_full",
                    "rank_edges_only", "join_subset_capacity",
                    "join_overflow_max", "round_fn_cache_hit", "round_ms_avg",
                    "ball_population_q95", "profile",
                ) if st.get(k) is not None
            })

    for i, matches in enumerate(results):
        mname = name if len(results) == 1 else f"{name}_model{chr(65 + i)}"
        if matches:
            dt, dr = _sym_delta(matches[0].transform, t_gts[i])
            _emit(mname, scene_points=int(scene.capacity), matches=len(matches),
                  translation_mm=dt * 1000, rotation_deg=dr,
                  cast_score=matches[0].cast_score, mmf=mmf,
                  compile_s=t_compile, prepare_s=t_prep, search_s=t_search)
        else:
            _emit(mname, scene_points=int(scene.capacity), matches=0, mmf=mmf,
                  compile_s=t_compile, prepare_s=t_prep, search_s=t_search)


def config6_two_instances(small):
    """Extra (beyond BASELINE.json): TWO instances of one model in 131k
    touching fog — the multi-instance masking protocol
    (impl/scene.hpp:39-98) at hardware scale."""
    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import fog_patches, make_box_model, rotation_matrix
    from triplet_match_tpu.search.driver import find_all, prepare_scene

    n_points = 131072 if not small else 16384
    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    policy = SearchPolicy()
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)

    rngc = np.random.default_rng(77)
    insts = []
    for off in [(-2.2, -1.5, 0.0), (2.0, 1.8, 0.5)]:
        r = rotation_matrix(rngc.normal(size=3), rngc.uniform(0, np.pi))
        t = np.array(off, np.float32)
        tg = np.eye(4, dtype=np.float32)
        tg[:3, :3] = r
        tg[:3, 3] = t
        insts.append((r, t, tg))
    n_clut = n_points - 2 * xyz.shape[0]
    cx, cn = fog_patches(rngc, n_clut, seed_base=900)
    sx = np.concatenate(
        [xyz @ r.T + t + rngc.normal(0, 0.001, xyz.shape).astype(np.float32)
         for r, t, _ in insts] + [cx])
    sn = np.concatenate([nrm @ r.T for r, _, _ in insts] + [cn])
    st = np.concatenate([tan @ r.T for r, _, _ in insts] + [np.zeros_like(cx)])
    scene = PointCloud.from_arrays(sx, sn, st)
    prep = prepare_scene(scene, policy)
    t0 = time.perf_counter()
    matches = find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                       sample_params=sample, discretization=disc, policy=policy,
                       max_icp_iterations=10, seed=5, prep=prep)
    t_search = time.perf_counter() - t0

    used, deltas = set(), []
    for m in matches:
        cands = [(_sym_delta(m.transform, tg), i)
                 for i, (_, _, tg) in enumerate(insts) if i not in used]
        if not cands:
            break
        (dt, dr), i = min(cands, key=lambda x: x[0][0])
        used.add(i)
        deltas.append((dt * 1000, dr))
    _emit("6_two_instances_131k", scene_points=int(scene.capacity),
          matches=len(matches),
          worst_translation_mm=max((d[0] for d in deltas), default=None),
          worst_rotation_deg=max((d[1] for d in deltas), default=None),
          mmf=0.5, search_s=t_search)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--fine-stride", type=int, default=None,
                    help="override policy.two_phase_fine_stride (diagnostics)")
    ap.add_argument("--fine-points", type=int, default=None,
                    help="override policy.fine_model_points (diagnostics)")
    ap.add_argument("--fine-strict", choices=["on", "off"], default=None,
                    help="override policy.two_phase_fine_strict (diagnostics)")
    ap.add_argument("--no-isolate", action="store_true",
                    help="run all configs in this process (default: one subprocess per config — the TPU runtime degrades after a large program)")
    args = ap.parse_args()
    wanted = sorted({int(c) for c in args.configs.split(",")})

    if not args.no_isolate and len(wanted) > 1:
        import subprocess

        for c in wanted:
            cmd = [sys.executable, os.path.abspath(__file__), "--configs", str(c),
                   "--no-isolate"] + (["--small"] if args.small else [])
            if args.fine_stride is not None:
                cmd += ["--fine-stride", str(args.fine_stride)]
            if args.fine_points is not None:
                cmd += ["--fine-points", str(args.fine_points)]
            if args.fine_strict is not None:
                cmd += ["--fine-strict", args.fine_strict]
            res = subprocess.run(cmd)
            if res.returncode != 0:
                _emit(f"{c}_FAILED", returncode=res.returncode)
        return

    _setup_jax()
    wanted = set(wanted)
    overrides = {}
    if args.fine_stride is not None:
        overrides["two_phase_fine_stride"] = args.fine_stride
    if args.fine_points is not None:
        overrides["fine_model_points"] = args.fine_points
    if args.fine_strict is not None:
        overrides["two_phase_fine_strict"] = args.fine_strict == "on"
    overrides = overrides or None

    if 1 in wanted:
        config1_plane(args.small)
    if 2 in wanted:
        config2_cylinder(args.small)
    if 3 in wanted:
        _match_config("3_rigid_100k", 100_000 - 2400, args.small,
                      policy_overrides=overrides)
    if 4 in wanted:
        _match_config("4_icp_500k", 500_000 - 2400, args.small, icp=15,
                      policy_overrides=overrides)
    if 5 in wanted:
        _match_config("5_raycast_1m", 1_000_000 - 4800, args.small, raycast=True,
                      multi=True, two_models=True, policy_overrides=overrides)
    if 6 in wanted:
        config6_two_instances(args.small)


if __name__ == "__main__":
    main()
