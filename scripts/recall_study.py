"""Two-phase scorer recall study on TPU hardware.

Sweeps two-phase ranking settings (coarse-model phase-1 on/off, neighborhood
stride, keep fraction) over N seeds of a dense TOUCHING-clutter scene — the
hardest discrimination regime (clutter patches may cross/overlap the
instance) — and reports per-setting recall and pose error.  This is the
protocol that gated the round-2 default flip (stride 8 / keep 1/16); rerun
it whenever a ranking default changes.

    python scripts/recall_study.py [--seeds 10] [--points 131072] \
        [--settings coarse:8:32:4,exact:8:16:1]

Each setting is "<coarse|exact>:<stride>:<keep_frac>[:<fine_stride>]"
(fine_stride defaults to 1 = full-K survivor counts).  The DEFAULT settings
are the SHIPPED SearchPolicy ranking knobs (coarse:8:32:4) plus the exact
single-phase control at the historical protocol values (exact:8:16:1), so a
bare run is hardware acceptance evidence for the production defaults.
Prints one JSON line per setting with found/total and worst-case pose
deltas.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def model_arrays(kind: str = "box"):
    """The study's model families (``--model``):

    - ``box``: the historical protocol model (25% edge points).
    - ``low-edge``: 5% edge points — the adversarial case for the
      ``rank_edges_only`` auto-trigger (driver fog switch): edge-only
      ranking must discriminate on a tiny, noisy statistic.
    - ``lattice``: graded wireframe scaffold (every point an edge point)
      whose discretized pair buckets exceed the reference's
      query_limit=200 (impl/scene.hpp:19) — pins the even-stride bucket
      read (index/model.query_pairs) at realistic bucket sizes.
    """
    from triplet_match_tpu.io.synthetic import make_box_model, make_lattice_model

    if kind == "box":
        return make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    if kind == "low-edge":
        return make_box_model(n_edge=120, n_face=2280, size=(1.0, 0.8, 0.6), seed=0)
    if kind == "lattice":
        # the edge-dense-study scaffold (hardware-proven compile path);
        # graded spacing breaks the self-symmetries so _sym_delta applies.
        # Pair buckets at this density far exceed query_limit=200 — the
        # CPU companion (tests/test_recall_fixtures.py) pins the bucket
        # statistics explicitly on a uniform lattice.
        return make_lattice_model(cells=4, n_edge=20000, graded=True, seed=0)
    raise ValueError(f"unknown model kind {kind!r}")


def build_scene(n_points, seed, arrays=None):
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.io.synthetic import fog_patches, rotation_matrix

    xyz, nrm, tan = arrays if arrays is not None else model_arrays("box")
    rngc = np.random.default_rng(1000 + seed)
    r_inst = rotation_matrix(rngc.normal(size=3), rngc.uniform(0, np.pi))
    t_off = rngc.uniform(-1.5, 1.5, 3).astype(np.float32)

    n_clutter = n_points - xyz.shape[0]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--settings", default="coarse:8:32:4,exact:8:16:1")
    ap.add_argument("--coarse-points", type=int, default=None,
                    help="coarse block size (policy.coarse_model_points)")
    ap.add_argument("--fine-points", type=int, default=None,
                    help="medium block size (policy.fine_model_points)")
    ap.add_argument("--fine-coarse", choices=["on", "off"], default=None,
                    help="survivor ranking on the medium 4-D block "
                         "(default: the policy default, which is ON — "
                         "pass off to gate the knob)")
    ap.add_argument("--coarse-linear", action="store_true",
                    help="pose-linearized coarse kernel")
    ap.add_argument("--fine-strict", choices=["on", "off"], default=None,
                    help="strict-gate PRIMARY ranking in the fine pass "
                         "(default: the policy default, which is ON)")
    ap.add_argument("--model", choices=["box", "low-edge", "lattice"],
                    default="box", help="model family (see model_arrays)")
    ap.add_argument("--interpret", action="store_true",
                    help="run the production Pallas ranking in f32 interpret "
                         "mode (CPU pre-validation of ranking-knob flips; "
                         "the protocol behind the *_cpu_interp RESULTS rows)")
    ap.add_argument("--no-isolate", action="store_true",
                    help="run all settings in this process (default: one "
                         "subprocess per setting — the TPU runtime degrades "
                         "after a long prior program)")
    args = ap.parse_args()

    if not args.no_isolate and len(args.settings.split(",")) > 1:
        import subprocess

        for s in args.settings.split(","):
            cmd = [sys.executable, os.path.abspath(__file__), "--no-isolate",
                   "--seeds", str(args.seeds), "--points", str(args.points),
                   "--settings", s.strip()]
            if args.coarse_points is not None:
                cmd += ["--coarse-points", str(args.coarse_points)]
            if args.fine_points is not None:
                cmd += ["--fine-points", str(args.fine_points)]
            if args.fine_coarse is not None:
                cmd += ["--fine-coarse", args.fine_coarse]
            if args.coarse_linear:
                cmd += ["--coarse-linear"]
            if args.fine_strict is not None:
                cmd += ["--fine-strict", args.fine_strict]
            if args.interpret:
                cmd += ["--interpret"]
            if args.model != "box":
                cmd += ["--model", args.model]
            res = subprocess.run(cmd)
            if res.returncode != 0:
                print(json.dumps({"setting": s.strip(), "FAILED": res.returncode}),
                      flush=True)
        return

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from run_baseline_configs import _sym_delta

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.search.driver import find_all, prepare_scene

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    base = SearchPolicy()

    arrays = model_arrays(args.model)
    xyz, nrm, tan = arrays
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, base)
    jax.block_until_ready(model.keys)

    settings = []
    for s in args.settings.split(","):
        parts = s.strip().split(":")
        kind, stride, keep = parts[0], int(parts[1]), int(parts[2])
        fine = int(parts[3]) if len(parts) > 3 else 1
        settings.append((kind, stride, keep, fine))

    scenes = []
    for seed in range(args.seeds):
        scene, t_gt = build_scene(args.points, seed, arrays=arrays)
        scenes.append((scene, t_gt))

    for kind, stride, keep, fine in settings:
        extra = {}
        if args.coarse_points is not None:
            extra["coarse_model_points"] = args.coarse_points
        if args.fine_points is not None:
            extra["fine_model_points"] = args.fine_points
        if args.fine_coarse is not None:
            extra["two_phase_fine_coarse"] = args.fine_coarse == "on"
        if args.coarse_linear:
            extra["two_phase_coarse_linear"] = True
        if args.fine_strict is not None:
            extra["two_phase_fine_strict"] = args.fine_strict == "on"
        if args.interpret:
            extra["scorer"] = "pallas"
            extra["pallas_interpret"] = True
        policy = dataclasses.replace(
            base, two_phase_stride=stride, two_phase_keep_frac=keep,
            two_phase_coarse_model=(kind == "coarse"),
            two_phase_fine_stride=fine, **extra,
        )
        found, dts, drs, secs, per_seed = 0, [], [], [], []
        for seed, (scene, t_gt) in enumerate(scenes):
            t0 = time.perf_counter()
            matches = find_all(
                model, scene, dist_thres=3.0, model_match_factor=0.5,
                sample_params=sample, discretization=disc, policy=policy,
                max_icp_iterations=10, seed=5,
            )
            secs.append(time.perf_counter() - t0)
            if matches:
                dt, dr = _sym_delta(matches[0].transform, t_gt)
                found += 1
                dts.append(dt * 1000)
                drs.append(dr)
                per_seed.append({"seed": seed, "mm": round(dt * 1000, 3),
                                 "deg": round(dr, 3)})
            else:
                per_seed.append({"seed": seed, "mm": None, "deg": None})
        print(json.dumps({
            "setting": f"{kind}:{stride}:{keep}:{fine}" + (
                f" cpts={args.coarse_points}" if args.coarse_points else "") + (
                f" fpts={args.fine_points}" if args.fine_points else "") + (
                f" fc={args.fine_coarse}" if args.fine_coarse else "") + (
                " lin" if args.coarse_linear else "") + (
                f" fstrict={args.fine_strict}" if args.fine_strict else "") + (
                " interp" if args.interpret else "") + (
                f" model={args.model}" if args.model != "box" else ""),
            "found": found, "total": args.seeds,
            "max_translation_mm": round(max(dts), 4) if dts else None,
            "max_rotation_deg": round(max(drs), 4) if drs else None,
            "mean_search_s": round(float(np.mean(secs)), 2),
            "per_seed": per_seed,
        }), flush=True)


if __name__ == "__main__":
    main()
