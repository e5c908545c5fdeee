"""Regressions for the round-3 high-effort review batch #5 (ops/index/io/
verify): each test pins a fix that changed observable behavior."""

import numpy as np
import pytest
import jax.numpy as jnp

from triplet_match_tpu.core.cloud import PointCloud


def test_knn_exact_on_far_offset_bucketed_cloud():
    """Candidate centering must be validity-weighted: zero-filled padding
    rows used to drag the center toward the origin, leaving residual
    coordinates ~|offset|/2 and the matmul-expansion error above the point
    spacing (ops/knn.py review fix)."""
    from triplet_match_tpu.ops.knn import knn

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (500, 3)).astype(np.float32) * 0.01 + 1000.0
    # 50% zero padding (a capacity-bucketed cloud)
    xyz = np.concatenate([pts, np.zeros((500, 3), np.float32)])
    valid = np.concatenate([np.ones(500, bool), np.zeros(500, bool)])

    q = pts[:50]
    idx, d2 = knn(jnp.asarray(q), jnp.asarray(xyz), jnp.asarray(valid), 1)
    # exact 1-NN on the host
    ref = np.argmin(
        ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1) + np.where(
            np.arange(500)[None, :] >= 0, 0.0, 0.0), axis=1)
    assert np.array_equal(np.asarray(idx)[:, 0], ref)


def test_query_pairs_stride_spans_full_bucket_under_limit():
    """query_limit bounds the RETURNED count, not the stride reach: a
    300-pair bucket with limit=64 must surface pairs from the bucket tail
    (the pre-fix clamp hid every pair past index `limit` from all queries
    forever — index/model.py review fix)."""
    import dataclasses

    from triplet_match_tpu.config import DiscretizationParams
    from triplet_match_tpu.features import discretize as dz
    from triplet_match_tpu.index.model import CompiledModel, query_pairs

    params = DiscretizationParams()
    bounds_min = jnp.zeros(4)
    bounds_max = jnp.ones(4) * 2.0
    feat = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    key = dz.pack_key(dz.discretize_feature(feat, bounds_min, bounds_max, params))

    blen = 300
    keys = jnp.full((blen,), key, jnp.uint32)
    pairs = jnp.stack([jnp.arange(blen, dtype=jnp.int32)] * 2, axis=1)
    cloud = PointCloud.from_arrays(np.zeros((4, 3), np.float32))
    model = CompiledModel(
        cloud=cloud, resolution=jnp.float32(1), diameter=jnp.float32(1),
        to_voxel=jnp.eye(4), lut=jnp.zeros((1, 1, 1), jnp.int32),
        edge=jnp.zeros(4, bool), bounds_min=bounds_min, bounds_max=bounds_max,
        keys=keys, pairs=pairs, pair_count=jnp.int32(blen),
        n_edge=jnp.int32(4), n_all=jnp.int32(4), margin=5,
    )

    got, valid = query_pairs(model, feat[None, :], params, cap=16, limit=64)
    g = np.asarray(got[0])[np.asarray(valid[0])]
    assert g.shape[0] == 16  # min(blen, cap, limit)
    assert g[:, 0].max() > 250  # reaches the bucket tail
    assert len(set(g[:, 0].tolist())) == 16  # distinct positions


def test_save_model_literal_path_roundtrip(tmp_path):
    """save_model writes the LITERAL path even without an .npz suffix
    (np.savez used to silently append one — index/serialize.py fix)."""
    from triplet_match_tpu.config import (
        DiscretizationParams, SampleParams, SearchPolicy,
    )
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.index.serialize import load_model, save_model
    from triplet_match_tpu.io.synthetic import make_box_model

    xyz, nrm, tan = make_box_model(n_edge=60, n_face=120, size=(1, 1, 1), seed=0)
    model = compile_model(
        PointCloud.from_arrays(xyz, nrm, tan), DiscretizationParams(),
        SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95),
        SearchPolicy())
    p = str(tmp_path / "model.bin")  # no .npz suffix
    save_model(p, model, DiscretizationParams())
    import os

    assert os.path.exists(p) and not os.path.exists(p + ".npz")
    loaded = load_model(p)
    assert int(loaded.n_all) == int(model.n_all)


def test_raycast_far_origin_no_false_occlusion():
    """Perpendicular distance via the cross product: at origin distances
    ~100x the point radius the old |rel|^2 - lam^2 form carried f32 error
    the size of r^2 and flipped the gate pseudo-randomly
    (verify/raycast.py fix)."""
    from triplet_match_tpu.verify.raycast import cast_visibility

    origin = np.array([150.0, 0.0, 0.0], np.float32)
    targets = np.zeros((1, 3), np.float32)  # one ray along -x
    r = 0.005  # |rel|^2 ~ 5.6e3 carries ~7e-4 f32 error >> r^2 = 2.5e-5
    # occluder on the ray's path, offset perpendicular by exactly 4r
    occ = np.array([[75.0, 4.0 * r, 0.0]], np.float32)
    vis = cast_visibility(
        jnp.asarray(origin), jnp.asarray(targets),
        jnp.ones(1, bool), jnp.eye(4),
        jnp.asarray(occ), jnp.ones(1, bool), r, 2.0 * r,
    )
    assert bool(vis[0])  # not occluded
    # and a true blocker (0.5r off-axis) IS detected at the same scale
    occ2 = np.array([[75.0, 0.5 * r, 0.0]], np.float32)
    vis2 = cast_visibility(
        jnp.asarray(origin), jnp.asarray(targets),
        jnp.ones(1, bool), jnp.eye(4),
        jnp.asarray(occ2), jnp.ones(1, bool), r, 2.0 * r,
    )
    assert not bool(vis2[0])


def test_cast_visibility_multi_rejects_empty_origins():
    from triplet_match_tpu.verify.raycast import cast_visibility_multi

    with pytest.raises(ValueError, match="at least one origin"):
        cast_visibility_multi(
            np.zeros((0, 3), np.float32), jnp.zeros((4, 3)), jnp.ones(4, bool),
            jnp.eye(4), jnp.zeros((4, 3)), jnp.ones(4, bool), 0.01, 0.02)


def test_curvature_cloud_smaller_than_k_is_masked():
    """Unfilled kNN slots must not fold point 0's normal into every
    covariance (ops/curvature.py fix)."""
    from triplet_match_tpu.ops.curvature import principal_curvatures

    rng = np.random.default_rng(2)
    xyz = rng.uniform(0, 1, (5, 3)).astype(np.float32)
    nrm = rng.normal(size=(5, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    cloud = PointCloud.from_arrays(xyz, nrm, np.zeros_like(xyz))
    info = principal_curvatures(cloud, k=30)
    assert np.isfinite(np.asarray(info.pc_max)).all()
    # reference: brute covariance over the 5 REAL neighbors only
    from triplet_match_tpu.ops.curvature import curvature_from_neighbors

    ref = curvature_from_neighbors(
        cloud.normal[:5], jnp.broadcast_to(cloud.normal[None, :5, :], (5, 5, 3)))
    assert np.allclose(np.asarray(info.pc_max)[:5],
                       np.asarray(ref.pc_max), atol=1e-5)


def test_knn_radius_estimate_finite_on_tiny_cloud():
    """All-NaN quantile (no query has k valid neighbors) must fall back to
    the bbox diagonal, not poison the grid build (ops/gridnn.py fix)."""
    from triplet_match_tpu.ops.gridnn import estimate_knn_radius

    xyz = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (4, 3)),
                      jnp.float32)
    valid = jnp.ones(4, bool)
    r = estimate_knn_radius(xyz, valid, k=30)
    assert np.isfinite(float(r)) and float(r) > 0


def test_voxel_grid_shrink_converges_for_anisotropic_models():
    """Near-1D models must still respect the LUT voxel budget: the old
    cube-root shrink stalled when two axes clamped at 1
    (index/model.py fix)."""
    from triplet_match_tpu.index.model import _MAX_LUT_VOXELS, _voxel_grid_setup

    extents, _ = _voxel_grid_setup(
        np.zeros(3, np.float32),
        np.array([1000.0, 1e-6, 1e-6], np.float32),
        resolution_val=1e-6, margin=5)
    assert int(np.prod(extents)) <= _MAX_LUT_VOXELS * 1.01
