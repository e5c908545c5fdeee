"""CPU f32 A/B: dense-scene routing at 4M-like LOCAL fog density.

The 4M scaling run under the round-4 exact dense routing lost one of two
seeds (RESULTS_r4 r4_hw_scaling_ann) while pose error improved 16x.  This
isolates the ROUTING on CPU interpret (f32, no bf16 confound) at the same
local density: fog patches concentrated around the instance so the
model-diameter ball population matches the 4M regime, at a scene size CPU
can search.

Variants:
  new  — shipped defaults (the fog-density switch routes to the exact
         configuration: full-pack phase 1, full-K rescore, keep 8)
  old  — the pre-r4 dense config (coarse-block phase 1, full-pack
         stride-4 rescore, keep 8), reached by disabling the adaptive
         switch and setting its pre-r4 replacement by hand

    python scripts/dense_ab_cpu.py [--seeds 6] [--fog 120000]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dense_scene(n_fog: int, seed: int):
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.io.synthetic import (
        fog_patches, make_box_model, rotation_matrix,
    )

    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    rngc = np.random.default_rng(3000 + seed)
    r_inst = rotation_matrix(rngc.normal(size=3), rngc.uniform(0, np.pi))
    t_off = rngc.uniform(-0.3, 0.3, 3).astype(np.float32)
    # fog concentrated in a +-1.6 cube AROUND the instance: local density
    # matches the 4M-in-[-4,4]^3 recall scene's near-instance regime
    c_xyz, c_nrm = fog_patches(rngc, n_fog, seed_base=7000 + 100 * seed, extent=1.6)
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
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--fog", type=int, default=120000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from run_baseline_configs import _sym_delta

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import make_box_model
    from triplet_match_tpu.search import driver

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    base = SearchPolicy(scorer="pallas", pallas_interpret=True)
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, base)

    variants = {
        "new_exact_routing": base,
        "old_dense_config": dataclasses.replace(
            base, adaptive_fine_rescore=False, two_phase_fine_coarse=False,
            two_phase_keep_frac=8,
        ),
    }
    scenes = [build_dense_scene(args.fog, s) for s in range(args.seeds)]
    for name, pol in variants.items():
        found, per_seed = 0, []
        t0 = time.perf_counter()
        for seed, (scene, t_gt) in enumerate(scenes):
            m = driver.find_all(model, scene, dist_thres=3.0,
                                model_match_factor=0.5, sample_params=sample,
                                discretization=disc, policy=pol,
                                max_icp_iterations=10, seed=5)
            st = dict(driver.LAST_SEARCH_STATS)
            if m:
                dt, dr = _sym_delta(m[0].transform, t_gt)
                found += 1
                per_seed.append({"seed": seed, "mm": round(float(dt) * 1000, 3),
                                 "ball_q95": st.get("ball_population_q95"),
                                 "full": st.get("fine_rescore_full")})
            else:
                per_seed.append({"seed": seed, "mm": None,
                                 "ball_q95": st.get("ball_population_q95"),
                                 "full": st.get("fine_rescore_full"),
                                 "finalists": st.get("finalists"),
                                 "accepted": st.get("accepted"),
                                 "rounds": st.get("rounds")})
        print(json.dumps({
            "config": "dense_ab_cpu", "variant": name, "fog": args.fog,
            "found": found, "total": args.seeds,
            "elapsed_s": round(time.perf_counter() - t0, 1),
            "per_seed": per_seed,
        }), flush=True)


if __name__ == "__main__":
    main()
