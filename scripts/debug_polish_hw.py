"""Dissect the tight polish on a hardware-scale fog scene, per iteration.

The round-5 floor-gated point-to-line polish regressed hardware pose error
(500k recall max 0.495 -> 9.07 mm, 2M scaling 0.386 -> 4.17 mm) while every
CPU fixture — including the production tight_polish driven directly — shows
it equal-or-better than point-to-point.  This script removes the find_all
wrapper from the equation: it builds the recall-protocol scene for one
seed, obtains the accepted UNPOLISHED pose (find_all with
tight_icp_iterations=0), then replays the annealed tight loop step by step
in all three fit modes (p2p Kabsch / GN every step / floor-gated GN),
printing per-iteration pose deltas, in-band edge-corr counts, and the
at-floor gate decisions.

    python scripts/debug_polish_hw.py --points 500000 --seed 5
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=500000)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        try:
            jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass

    import jax.numpy as jnp
    import numpy as np

    from recall_study import build_scene
    from run_baseline_configs import _sym_delta

    from triplet_match_tpu.config import (
        DiscretizationParams, SampleParams, SearchPolicy)
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.core.transforms import (
        gauss_newton_pose_step, transform_points, weighted_kabsch)
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import make_box_model
    from triplet_match_tpu.search import driver
    from triplet_match_tpu.search.score import finish_find

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    policy = SearchPolicy()
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800,
                                   size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)
    scene, t_gt = build_scene(args.points, args.seed)
    prep = driver.prepare_scene(scene, policy)

    # the accepted, relaxed-ICP pose with NO tight polish
    nop = dataclasses.replace(policy, tight_icp_iterations=0)
    m = driver.find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                        sample_params=sample, discretization=disc, policy=nop,
                        max_icp_iterations=10, seed=5, prep=prep)
    if not m:
        print(json.dumps({"error": "no match at tight=0"}))
        return 1
    from triplet_match_tpu.core.transforms import invert_rigid

    # Match.transform is the reporting (model->scene) convention;
    # finish_find / the polish operate on scene->model
    t0 = jnp.asarray(invert_rigid(jnp.asarray(m[0].transform)))
    d_mm, d_deg = _sym_delta(m[0].transform, t_gt)
    print(json.dumps({"stage": "unpolished", "mm": round(float(d_mm) * 1e3, 3),
                      "deg": round(float(d_deg), 3)}), flush=True)

    dist_thres = 3.0
    iters = policy.tight_icp_iterations
    anneal = policy.tight_anneal
    raw_tm = jnp.linalg.norm(prep.cloud.tangent, axis=-1) > 0.7
    raw_w = raw_tm.astype(jnp.float32)
    consumed = jnp.zeros(prep.cloud.xyz.shape[0], bool)
    factors = np.maximum(anneal ** np.arange(iters, dtype=np.float32), 1.0 / 16.0)
    floor = dist_thres / 16.0

    @jax.jit
    def step_stats(t, thres):
        corrs = finish_find(model, prep.cloud, raw_tm, consumed, t, thres,
                            exact=True)
        w = corrs.valid.astype(jnp.float32)
        we = w * raw_w
        cnt_e = jnp.sum(we)
        w = jnp.where(cnt_e >= 12.0, we, w)
        # orientation weight (production default)
        midx = corrs.model_idx
        ref = jnp.where(raw_tm[:, None], prep.cloud.tangent, prep.cloud.normal)
        tref = ref @ t[:3, :3].T
        mtan = model.cloud.tangent[midx]
        is_tan = jnp.linalg.norm(mtan, axis=-1) > 0.7
        ref_n = jnp.where(is_tan[:, None], mtan, model.cloud.normal[midx])
        w = w * jnp.abs(jnp.sum(tref * ref_n, axis=-1))
        t_kab = weighted_kabsch(prep.cloud.xyz, model.cloud.xyz[midx], w)
        src = transform_points(t, prep.cloud.xyz)
        m_dir = jnp.where(is_tan[:, None], mtan, model.cloud.normal[midx])
        m_dir = m_dir / jnp.maximum(
            jnp.linalg.norm(m_dir, axis=-1, keepdims=True), 1e-12)
        upd = gauss_newton_pose_step(src, model.cloud.xyz[midx], m_dir, is_tan, w)
        # precision-pinned like production refine/icp.py — this script's
        # original unpinned compose reproduced the bf16 failure on chip
        # (evidence_r5/debugpolish500k_r5: Kabsch 0.049 mm, unpinned GN
        # 9-10 mm) and was the controlled demonstration of ROADMAP 25d
        t_gn = jnp.matmul(upd, t, precision=jax.lax.Precision.HIGHEST)
        # how many weighted corrs map to model EDGE vs SURFACE points
        n_w = jnp.sum(w > 0)
        n_w_edge = jnp.sum((w > 0) & is_tan)
        return t_kab, t_gn, corrs.count, cnt_e, n_w, n_w_edge

    for mode in ("never", "always", "floor"):
        t = t0
        for i in range(iters):
            thres = float(dist_thres * factors[i])
            t_kab, t_gn, cnt, cnt_e, n_w, n_w_edge = step_stats(t, thres)
            use_gn = (mode == "always") or (
                mode == "floor" and thres <= 2.001 * floor)
            t_next = t_gn if use_gn else t_kab
            if int(cnt) < 3:
                t_next = t
            dk_mm, dk_deg = _sym_delta(np.asarray(invert_rigid(t_kab)), t_gt)
            dg_mm, dg_deg = _sym_delta(np.asarray(invert_rigid(t_gn)), t_gt)
            print(json.dumps({
                "mode": mode, "iter": i, "thres_factor": round(float(factors[i]), 4),
                "gn": bool(use_gn), "count": int(cnt), "cnt_edge": float(cnt_e),
                "n_w": int(n_w), "n_w_model_edge": int(n_w_edge),
                "kab_mm": round(float(dk_mm) * 1e3, 3), "kab_deg": round(float(dk_deg), 3),
                "gn_mm": round(float(dg_mm) * 1e3, 3), "gn_deg": round(float(dg_deg), 3),
            }), flush=True)
            t = t_next
        d_mm, d_deg = _sym_delta(np.asarray(invert_rigid(t)), t_gt)
        print(json.dumps({"mode": mode, "final_mm": round(float(d_mm) * 1e3, 3),
                          "final_deg": round(float(d_deg), 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
