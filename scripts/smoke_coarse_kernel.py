"""Hardware smoke for the chunked/multi-group coarse kernel.

Runs score_groups_coarse (and the linear variant) on the REAL chip at the
exact shape family that OOMed the unchunked kernel (fine_stride=1:
K=512 scene points x Nc=768 fine block x pose_tile=32 — a 48 MB distance
tile before chunking, evidence_r4/recall131k.log), and asserts the counts
match the f32 interpret oracle.  One JSON line on success.

    python scripts/smoke_coarse_kernel.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import make_box_model
    from triplet_match_tpu.search import score_pallas as sp

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample,
                          SearchPolicy())
    mpack = sp.pack_model(model, coarse_points=256, fine_points=768)

    rng = np.random.default_rng(7)
    g, hg, k = 64, 32, 512  # the OOM family: keep=32 survivors, full-K fine pass
    groups = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-1, 1, (g, 3, k)).astype(np.float32),
                (rng.uniform(0, 1, (g, 1, k)) > 0.5).astype(np.float32),
                np.ones((g, 1, k), np.float32),
                rng.normal(0, 1, (g, 3, k)).astype(np.float32),
            ],
            axis=1,
        )
    )
    rots = np.linalg.qr(rng.normal(size=(g, hg, 3, 3)))[0].astype(np.float32)
    ts = np.tile(np.eye(4, dtype=np.float32), (g, hg, 1, 1))
    ts[..., :3, :3] = rots
    ts[..., :3, 3] = rng.uniform(-0.5, 0.5, (g, hg, 3)).astype(np.float32)
    rows = sp.poses_to_rows(jnp.asarray(ts))

    thres = 3.0 * float(model.resolution)
    t2 = (thres + float(mpack.fine_slack)) ** 2
    t2s = thres * thres

    results = {}
    for name, fn, kw in (
        ("direct", sp.score_groups_coarse, {}),
        ("direct_strictprimary", sp.score_groups_coarse, {"strict_primary": True}),
        ("linear", sp.score_groups_coarse_linear, {}),
    ):
        # 1) ENVELOPE vs the f32 interpret oracle at mxu_precision="highest".
        # NOT exact by design: the kind gate rides a 4th coordinate, so a
        # same-kind pair's (w - w_m)^2 = 0 is computed by CANCELLATION of
        # kind_off^2-magnitude products, and the TPU "highest" bf16x3
        # decomposition's error on those products exceeds an f32 ulp —
        # near-gate counts can flip (measured max 18/512 on this
        # adversarial uniform fixture, evidence_r4/smoke4.log; production
        # gates are slack-inflated so flips are ranking noise there).
        # The hard refactor guard is check 3 (regroup invariance).
        ref = np.asarray(fn(mpack, groups, rows, t2, t2s, pose_tile=32,
                            block="fine", interpret=True,
                            mxu_precision="highest", **kw))
        hw_hi = np.asarray(jax.block_until_ready(
            fn(mpack, groups, rows, t2, t2s, pose_tile=32, block="fine",
               mxu_precision="highest", **kw)))
        hi_diff = np.abs(np.floor(hw_hi) - np.floor(ref))
        results.setdefault(name, {})["highest_max_count_diff"] = int(hi_diff.max())
        results[name]["highest_mismatch_frac"] = round(float((hi_diff > 0).mean()), 4)
        assert hi_diff.max() <= 32, (name, "highest-vs-interpret", hi_diff.max())

        # 2) production precision runs (bf16 inputs) — report the borderline
        # flip envelope vs f32 on this ADVERSARIAL fixture (uniform random
        # points put a dense d2 mass at the gate; production scenes sit far
        # sparser, see check_kernel_parity), no hard bound
        t0 = time.perf_counter()
        out = np.asarray(jax.block_until_ready(
            fn(mpack, groups, rows, t2, t2s, pose_tile=32, block="fine", **kw)
        ))
        dt_cold = time.perf_counter() - t0
        diff = np.abs(np.floor(out) - np.floor(ref))
        results[name].update({
            "bf16_max_count_diff": int(diff.max()),
            "bf16_mismatch_frac": round(float((diff > 0).mean()), 4),
            "cold_s": round(dt_cold, 1),
        })

        # 3) REGROUPING INVARIANCE on hardware: bf16 rounding is applied to
        # the matmul INPUTS per element, so different (pose_tile, k_chunk,
        # group_block) tilings must produce bit-identical integer keys
        if fn is sp.score_groups_coarse:
            alt = np.asarray(jax.block_until_ready(
                fn(mpack, groups, rows, t2, t2s, pose_tile=8, group_block=2,
                   block="fine", **kw)))
            regroup_diff = int(np.abs(np.floor(alt) - np.floor(out)).max())
            assert regroup_diff == 0, (name, "regroup", regroup_diff)

    print(json.dumps({
        "smoke": "coarse_kernel_chunked",
        "shapes": {"g": g, "hg": hg, "k": k, "nc": int(mpack.md_fine.shape[1])},
        "backend": jax.default_backend(),
        **results,
        "ok": True,
    }), flush=True)


if __name__ == "__main__":
    main()
