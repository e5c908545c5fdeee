"""On-chip parity check: compiled Pallas scorer vs the jnp exact-NN oracle.

The test suite validates the kernel in interpret mode on CPU
(tests/test_score_pallas.py); this script validates the *compiled* kernel on
real TPU hardware against score_groups_exact_jnp — catching Mosaic-lowering
or MXU-precision divergences the interpreter cannot.
"""

from __future__ import annotations

import json
import os
import sys

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
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import prepare_scene
    from triplet_match_tpu.search.score_pallas import (
        pack_groups, pack_model, poses_to_rows,
        score_groups_exact_jnp, score_groups_pallas,
    )

    policy = SearchPolicy()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    disc = DiscretizationParams()
    xyz, nrm, tan = make_box_model(n_edge=300, n_face=900, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=4000, seed=7)
    prep = prepare_scene(scene, policy)

    g, hg, k = 8, 64, 256
    rng = np.random.default_rng(3)
    n = prep.cloud.xyz.shape[0]
    nbr_idx = jnp.asarray(rng.integers(0, n, (g, k)).astype(np.int32))
    nbr_valid = jnp.asarray(rng.random((g, k)) > 0.1)
    t_inv = np.linalg.inv(np.asarray(t_gt)).astype(np.float32)
    ts = np.tile(t_inv, (g, hg, 1, 1))
    ts[:, : hg // 2, :3, 3] += rng.normal(0, 0.002, (g, hg // 2, 3)).astype(np.float32)
    ts[:, hg // 2 :, :3, 3] += rng.normal(0, 1.0, (g, hg // 2, 3)).astype(np.float32)
    ts = jnp.asarray(ts)
    consumed = jnp.zeros(n, bool)
    thres2 = (3.0 * float(model.resolution)) ** 2

    mpack = pack_model(model)
    groups = pack_groups(prep.cloud, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)

    _, c_pl = score_groups_pallas(mpack, groups, rows, thres2, mode="count", pose_tile=8,
                                  mxu_precision="highest")
    _, c_hi = score_groups_pallas(mpack, groups, rows, thres2, mode="count", pose_tile=8,
                                  mxu_precision="default")
    _, c_ref = score_groups_exact_jnp(
        model, prep.cloud, prep.tangent_mask, consumed, nbr_idx, nbr_valid, ts, 3.0
    )
    c_pl, c_ref, c_hi = np.asarray(c_pl), np.asarray(c_ref), np.asarray(c_hi)
    diff = np.abs(c_pl.astype(np.int64) - c_ref.astype(np.int64))
    diff_hi = np.abs(c_hi.astype(np.int64) - c_ref.astype(np.int64))
    print(json.dumps({
        "check": "pallas_vs_jnp_exact_counts",
        "poses": int(c_pl.size),
        "exact_equal_frac": float((diff == 0).mean()),
        "max_abs_diff": int(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "default_precision_equal_frac": float((diff_hi == 0).mean()),
        "default_precision_max_diff": int(diff_hi.max()),
    }))
    # Tolerance: the kernel's E-matmul runs on the MXU; boundary-distance
    # ties may flip a count by ~1 on points sitting exactly at thres.
    assert float((diff <= 2).mean()) > 0.999, "kernel diverges from oracle"
    print("PARITY OK")


if __name__ == "__main__":
    main()
