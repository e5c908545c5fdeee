"""Reliable-harness sweep of the two-phase ranking knobs on bench shapes.

Times score_groups_two_phase with EXACTLY the driver's kwargs while varying
one knob at a time around the production defaults (coarse block size,
keep fraction, medium fine block, pose tile).  Inputs rotate across 10
pre-staged pose batches per iteration — constant-input timing loops are
unreliable through the remote TPU tunnel (ROADMAP 3d3: byte-identical
repeats sometimes return impossibly fast, sometimes inflated).

Prints one JSON line per config; any default flip must additionally clear
scripts/recall_study.py (10-seed touching fog) before shipping.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NB = 10  # pre-staged pose batches (rotated per timing iteration)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated config names to run")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from triplet_match_tpu.config import (
        DiscretizationParams, SampleParams, SearchPolicy,
    )
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import prepare_scene
    from triplet_match_tpu.search import score_pallas as sp

    # let the gbN configs bind past the production slot budget so the
    # sweep can measure (and re-measure) the SMEM ceiling itself: gb32 x
    # pt32 = 1024 slots measured EXACTLY over the 1 MB SMEM capacity
    # (evidence_r4/sweepgb.log), which is where the production 512-slot
    # cap comes from.
    sp._COARSE_SMEM_SLOTS = 1024

    G, HG, K = 256, 512, 512
    policy = SearchPolicy()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800,
                                   size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan),
                          DiscretizationParams(), sample, policy)
    scene, t_gt, _ = embed_in_scene(
        xyz, nrm, tan, noise=0.001, n_clutter=131072 - xyz.shape[0],
        clutter_extent=6.0, seed=3)
    prep = prepare_scene(scene, policy)

    rng = np.random.default_rng(0)
    t_inv = np.linalg.inv(np.asarray(t_gt)).astype(np.float32)
    rows_all = []
    for b in range(NB):
        ts = np.tile(t_inv, (G, HG, 1, 1))
        ts[..., :3, 3] += rng.normal(0, 0.5, (G, HG, 3)).astype(np.float32)
        rows_all.append(sp.poses_to_rows(jnp.asarray(ts)))
    rows_all = [jax.device_put(r) for r in rows_all]

    nbr_idx = jnp.asarray(rng.integers(0, 131072, (G, K)).astype(np.int32))
    consumed = jnp.zeros(prep.cloud.xyz.shape[0], bool)
    groups = sp.pack_groups(prep.cloud, prep.tangent_mask, consumed, nbr_idx,
                            jnp.ones((G, K), bool))
    thres = 3.0 * float(model.resolution)
    t2 = thres * thres
    n_pose = G * HG

    base = dict(coarse_points=policy.coarse_model_points,
                fine_points=policy.fine_model_points,
                keep_frac=policy.two_phase_keep_frac,
                pose_tile=policy.two_phase_pose_tile,
                group_block=policy.two_phase_group_block)
    configs = [
        ("default", dict(base)),
        ("gb1", dict(base, group_block=1)),
        ("gb2", dict(base, group_block=2)),
        ("gb4", dict(base, group_block=4)),
        ("gb16", dict(base, group_block=16)),
        ("gb32", dict(base, group_block=32)),
        ("pt8_gb16", dict(base, pose_tile=8, group_block=16)),
        ("pt16_gb16", dict(base, pose_tile=16, group_block=16)),
        ("pt64_gb16", dict(base, pose_tile=64, group_block=16)),
        ("d2bf16", dict(base, d2_bf16=True)),
        ("d2bf16_gb16", dict(base, d2_bf16=True, group_block=16)),
        ("keep64", dict(base, keep_frac=64)),
        ("keep64_fine1024", dict(base, keep_frac=64, fine_points=1024)),
        ("coarse192", dict(base, coarse_points=192)),
        ("coarse128", dict(base, coarse_points=128)),
        ("coarse128_keep64", dict(base, coarse_points=128, keep_frac=64)),
        ("pt16", dict(base, pose_tile=16)),
        ("pt64", dict(base, pose_tile=64)),
        ("fine1024", dict(base, fine_points=1024)),
        ("fine768", dict(base, fine_points=768)),
        ("keep64_fine768", dict(base, keep_frac=64, fine_points=768)),
        ("fine1536", dict(base, fine_points=1536)),
        ("fine512", dict(base, fine_points=512)),
    ]
    if args.only:
        names = set(args.only.split(","))
        configs = [c for c in configs if c[0] in names]

    for name, cfg in configs:
        mpack = sp.pack_model(model, coarse_points=cfg["coarse_points"],
                              fine_points=cfg["fine_points"])

        def run(rows, mpack=mpack, cfg=cfg):
            return sp.score_groups_two_phase(
                mpack, groups, rows, t2, mode=policy.ranking_mode,
                pose_tile=cfg["pose_tile"],
                coarse_stride=policy.two_phase_stride,
                keep_frac=cfg["keep_frac"],
                coarse_model=policy.two_phase_coarse_model,
                fine_stride=policy.two_phase_fine_stride,
                weighted_distance=policy.weighted_distance,
                negative_scores=policy.negative_scores,
                coarse_linear=policy.two_phase_coarse_linear,
                fine_coarse=policy.two_phase_fine_coarse,
                fine_strict=cfg.get("fine_strict", policy.two_phase_fine_strict),
                group_block=cfg.get("group_block", policy.two_phase_group_block),
                d2_bf16=cfg.get("d2_bf16", False),
            )

        try:
            out = run(rows_all[0])
            jax.block_until_ready(out)
            # second warmup on a different batch (second trace shape is same;
            # guards against lazy constant folding on batch 0)
            jax.block_until_ready(run(rows_all[1]))
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = run(rows_all[i % NB])
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "config": name, **cfg, "s": round(dt, 5),
                "ns_per_pose": round(dt / n_pose * 1e9, 1),
                "poses_per_sec": round(n_pose / dt, 1),
            }), flush=True)
        except Exception as e:  # pragma: no cover - hardware flake path
            print(json.dumps({"config": name, **cfg,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
