"""Diagnose the 500k-scene pose regression (config 4 at 5-9mm vs 0.36mm in
round 2): reproduce the exact config-4 scene and sweep one mechanism knob
per run, reporting the accepted match's corr count and score alongside the
symmetry-aware pose delta.

    python scripts/bisect_config4.py --variant default|exact|noadapt|keep16|coarse512

One subprocess per variant (the TPU runtime degrades after large programs).
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

VARIANTS = {
    "default": {},
    # single-phase exact ranking: no coarse pass, no fine block
    "exact": {"two_phase_scoring": False},
    # round-2 style static inner bound
    "noadapt": {"adaptive_second_samples": False},
    # more survivors per group
    "keep16": {"two_phase_keep_frac": 16},
    # round-2's wider coarse block (less gate inflation)
    "coarse512": {"coarse_model_points": 512},
    # narrower coarse blocks (MORE gate inflation): candidate throughput
    # flips — must hold sub-mm here before any default change
    "coarse192": {"coarse_model_points": 192},
    "coarse128": {"coarse_model_points": 128},
    "fine1536": {"fine_model_points": 1536},
    # no fine_coarse: survivors rescored on the FULL pack (r2-late style)
    "fullfine": {"two_phase_fine_coarse": False},
    # pre-fix tight polish (rounds 2-3 behavior): reproduces the regression
    # if the crossing-sheet ICP bias is the mechanism
    "tight2": {"tight_icp_iterations": 2, "tight_orientation_weight": False},
    # fog-density switch disabled: expected to reproduce the original
    # ~4-9 mm failure (the CPU f32 interpret bisect reproduced 4.04 mm with
    # the pre-switch defaults at this seed — ROADMAP 15)
    "noswitch": {"adaptive_fine_rescore": False},
    # not a ranking variant: ICP-polish straight from the ground-truth pose.
    # If THIS lands mm-off, the scene's fog biases the correspondence fit
    # itself (hard scene); if it lands sub-mm, the regression is hypothesis
    # selection/ranking.
    "gtpolish": {},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    ap.add_argument("--points", type=int, default=500_000)
    ap.add_argument("--interpret", action="store_true",
                    help="production Pallas ranking in f32 interpret mode "
                         "(CPU pre-validation; exonerates/implicates ranking "
                         "logic independent of bf16/hardware)")
    args = ap.parse_args()

    if args.variant is None:
        import subprocess

        for v in VARIANTS:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--variant", v, "--points", str(args.points)]
            if args.interpret:
                cmd.append("--interpret")
            res = subprocess.run(cmd)
            if res.returncode != 0:
                print(json.dumps({"variant": v, "FAILED": res.returncode}), flush=True)
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
    from triplet_match_tpu.io.synthetic import fog_patches, make_box_model, rotation_matrix
    from triplet_match_tpu.search.driver import find_all, prepare_scene

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    overrides = dict(VARIANTS[args.variant])
    if args.interpret:
        overrides.update(scorer="pallas", pallas_interpret=True)
    policy = dataclasses.replace(SearchPolicy(), **overrides)

    # identical to run_baseline_configs config 4 (one model-A instance)
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)
    jax.block_until_ready(model.keys)

    r_inst = rotation_matrix([0.3, 1.0, 0.2], 1.1)
    t_off = np.array([0.0, 0.0, 0.0], np.float32)
    rngc = np.random.default_rng(17)
    c_xyz, c_nrm = fog_patches(rngc, args.points - 2400, seed_base=100)
    i_xyz = xyz @ r_inst.T + t_off + rngc.normal(0, 0.001, xyz.shape).astype(np.float32)
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = r_inst
    scene = PointCloud.from_arrays(
        np.concatenate([i_xyz, c_xyz]),
        np.concatenate([nrm @ r_inst.T, c_nrm]),
        np.concatenate([tan @ r_inst.T, np.zeros_like(c_xyz)]),
    )
    prep = prepare_scene(scene, policy)
    jax.block_until_ready(prep.tangent_mask)

    if args.variant == "gtpolish":
        import jax.numpy as jnp

        from triplet_match_tpu.core.transforms import invert_rigid
        from triplet_match_tpu.refine.icp import icp_refine, tight_polish

        consumed = jnp.zeros(scene.xyz.shape[0], bool)
        # hypothesis-like start: exact gt would trip the count-non-shrink
        # stop immediately and hide the relaxed loop's clutter bias
        pert = np.eye(4, dtype=np.float32)
        pert[:3, :3] = rotation_matrix([0.5, -0.2, 0.8], np.deg2rad(1.5))
        pert[:3, 3] = [0.010, -0.008, 0.006]
        t_sm = jnp.asarray(invert_rigid(jnp.asarray(pert @ t_gt)))
        res = icp_refine(model, prep.cloud, prep.tangent_mask, consumed,
                         t_sm, 3.0, 15, tight_iterations=0)
        dt_rel, dr_rel = _sym_delta(np.asarray(invert_rigid(res.transform)), t_gt)
        row = {"variant": "gtpolish", "points": args.points,
               "relaxed_mm": round(dt_rel * 1000, 4),
               "relaxed_deg": round(dr_rel, 4),
               "corrs": int(res.corrs.count)}
        for tag, it, ow in [("tight2", 2, False), ("tight6ow", 6, True)]:
            t_tight = tight_polish(model, prep.cloud, prep.tangent_mask,
                                   consumed, res.transform, 3.0, iterations=it,
                                   orientation_weight=ow)
            dt_ti, dr_ti = _sym_delta(np.asarray(invert_rigid(t_tight)), t_gt)
            row[f"{tag}_mm"] = round(dt_ti * 1000, 4)
            row[f"{tag}_deg"] = round(dr_ti, 4)
        print(json.dumps(row), flush=True)
        return

    t0 = time.perf_counter()
    matches = find_all(model, scene, prep=prep, dist_thres=3.0,
                       model_match_factor=0.5, sample_params=sample,
                       discretization=disc, policy=policy,
                       max_icp_iterations=15, seed=5)
    t_search = time.perf_counter() - t0

    row = {"variant": args.variant, "points": args.points,
           "matches": len(matches), "search_s": round(t_search, 2)}
    if args.interpret:
        row["interpret"] = True
    if matches:
        m = matches[0]
        dt, dr = _sym_delta(m.transform, t_gt)
        row.update(translation_mm=round(dt * 1000, 4), rotation_deg=round(dr, 4),
                   corrs=int(np.asarray(m.scene_corrs).size),
                   signed_score=round(float(m.signed_score), 4))
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
