"""Acceptance tests for the five BASELINE.json configs (test scale).

Each config runs at CPU-tractable sizes with fixed seeds; the structure
(primitive kind, clutter, instance counts, verification path) matches the
config descriptions.  Full-size runs live in scripts/run_baseline_configs.py
for TPU hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.core.transforms import pose_delta
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import (
    embed_in_scene,
    make_box_model,
    make_cylinder,
    make_plane_patch,
    rotation_matrix,
)

DISC = DiscretizationParams()
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)


def test_config1_plane_in_10k_cloud():
    """Config 1: synthetic plane in a 10k-pt cloud (plane fit, CPU jax,
    fixed RNG seed)."""
    from triplet_match_tpu.primitives.detect import detect_plane

    rng = np.random.default_rng(42)
    pxyz, pn, _ = make_plane_patch(n=6000, size=(2.0, 2.0), seed=1)
    r = rotation_matrix([0.4, 1.0, 0.2], 0.7)
    t = np.array([0.3, -0.5, 1.2], np.float32)
    pxyz = (pxyz @ r.T + t) + rng.normal(0, 0.002, pxyz.shape).astype(np.float32)
    clutter = rng.uniform(-3, 3, (4000, 3)).astype(np.float32)
    cn = rng.normal(size=(4000, 3)).astype(np.float32)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    cloud = PointCloud.from_arrays(
        np.concatenate([pxyz, clutter]), np.concatenate([pn @ r.T, cn])
    )
    assert cloud.capacity == 10000
    det = detect_plane(cloud, key=jax.random.PRNGKey(0), num_hypotheses=256, threshold=0.01)
    inl = np.asarray(det.inliers)
    assert inl[:6000].mean() > 0.95
    assert inl[6000:].mean() < 0.03
    # recovered normal matches ground truth
    nrm = np.asarray(det.state.g2l)[2, :3]
    assert abs(abs(nrm @ r[:, 2]) - 1.0) < 1e-3


def test_config2_cylinder_detection():
    """Config 2: cylinder primitive detection + unrolled-chart scoring
    (the cylinder.cl uv path)."""
    from triplet_match_tpu.primitives import cylinder as cyl
    from triplet_match_tpu.primitives.detect import detect_cylinder

    rng = np.random.default_rng(7)
    cxyz, cn, _ = make_cylinder(n=4000, radius=0.35, height=1.5, seed=2, rim_edges=False)
    r = rotation_matrix([1, 0.3, 0.5], 1.3)
    t = np.array([0.5, 1.0, -0.2], np.float32)
    x = (cxyz @ r.T + t) + rng.normal(0, 0.002, cxyz.shape).astype(np.float32)
    clutter = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
    kn = rng.normal(size=(2000, 3)).astype(np.float32)
    kn /= np.linalg.norm(kn, axis=1, keepdims=True)
    cloud = PointCloud.from_arrays(np.concatenate([x, clutter]), np.concatenate([cn @ r.T, kn]))
    det = detect_cylinder(cloud, key=jax.random.PRNGKey(1), num_hypotheses=512, threshold=0.015)
    assert abs(float(det.state.radius) - 0.35) < 0.02
    inl = np.asarray(det.inliers)
    assert inl[:4000].mean() > 0.9
    # uv-chart scoring: inliers project with |w| ~ 0 (normalized radial dev)
    uvw, ok = cyl.project(det.state, cloud.xyz[:4000])
    w = np.asarray(uvw[..., 2])[np.asarray(ok[:4000])]
    assert np.abs(w).mean() < 0.05


def test_config3_rigid_model_in_cluttered_scene():
    """Config 3: rigid CAD model vs cluttered scene (identity projector).
    Full 100k-pt scale runs on TPU (scripts/run_baseline_configs.py)."""
    from triplet_match_tpu.search.driver import find_all

    policy = SearchPolicy(
        num_first_samples=64, num_second_samples=16, query_cap=8,
        score_neighbors=256, finalists=4, max_rounds=3,
    )
    xyz, nrm, tan = make_box_model(n_edge=300, n_face=900, size=(1.0, 0.7, 0.5), seed=3)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE, policy)
    scene, t_gt, _ = embed_in_scene(
        xyz, nrm, tan, noise=0.0015, n_clutter=8000, clutter_extent=8.0, seed=17
    )
    matches = find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                       sample_params=SAMPLE, discretization=DISC, policy=policy,
                       max_icp_iterations=10, seed=5)
    assert matches
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 6e-3
    assert float(np.degrees(float(dr))) < 0.6


def test_config4_batched_icp_refinement():
    """Config 4: match + batched ICP refinement (the icp.cl -> batched
    Kabsch path): many candidate poses refined in parallel."""
    from triplet_match_tpu.refine.icp import icp_refine
    from triplet_match_tpu.search.driver import prepare_scene

    policy = SearchPolicy()
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE, policy)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.002, n_clutter=2000, seed=9)
    prep = prepare_scene(scene, policy)
    n = prep.cloud.xyz.shape[0]
    consumed = jnp.zeros(n, bool)

    # batch of perturbed starts refined in parallel (vmap)
    rng = np.random.default_rng(0)
    t0 = np.linalg.inv(np.asarray(t_gt)).astype(np.float32)
    starts = np.tile(t0, (8, 1, 1))
    starts[:, :3, 3] += rng.normal(0, 0.02, (8, 3)).astype(np.float32)
    refined = jax.vmap(
        lambda t: icp_refine(model, prep.cloud, prep.tangent_mask, consumed, t, 3.0, 10)
    )(jnp.asarray(starts))
    from triplet_match_tpu.core.transforms import invert_rigid

    dts, drs = pose_delta(invert_rigid(refined.transform), jnp.asarray(t_gt)[None])
    assert float(jnp.max(dts)) < 4e-3, np.asarray(dts)
    assert float(jnp.max(jnp.degrees(drs))) < 0.5
    assert int(jnp.min(refined.corrs.count)) > 500


def test_config5_multi_model_raycast_verified():
    """Config 5: multi-model search with raycast-verified scoring."""
    from triplet_match_tpu.search.driver import find_all_multi

    policy = SearchPolicy(
        num_first_samples=64, num_second_samples=16, query_cap=8,
        score_neighbors=256, finalists=4, max_rounds=3,
    )
    box_a = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    box_b = make_box_model(n_edge=240, n_face=720, size=(0.5, 0.5, 1.4), seed=1)
    model_a = compile_model(PointCloud.from_arrays(*box_a), DISC, SAMPLE, policy)
    model_b = compile_model(PointCloud.from_arrays(*box_b), DISC, SAMPLE, policy)

    rng = np.random.default_rng(4)
    r1 = rotation_matrix([0, 0, 1], 0.5)
    r2 = rotation_matrix([1, 1, 0], 1.8)
    t1 = np.array([2.5, 0, 0], np.float32)
    t2 = np.array([-2.5, 0, 0], np.float32)
    parts = []
    for (xyz, nrm, tan), r, t in [(box_a, r1, t1), (box_b, r2, t2)]:
        parts.append((xyz @ r.T + t + rng.normal(0, 0.001, xyz.shape).astype(np.float32),
                      nrm @ r.T, tan @ r.T))
    clutter = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    kn = rng.normal(size=(1000, 3)).astype(np.float32)
    kn /= np.linalg.norm(kn, axis=1, keepdims=True)
    scene = PointCloud.from_arrays(
        np.concatenate([p[0] for p in parts] + [clutter]),
        np.concatenate([p[1] for p in parts] + [kn]),
        np.concatenate([p[2] for p in parts] + [np.zeros_like(clutter)]),
    )

    origins = np.array([[8, 0, 2], [-8, 0, 2], [0, 8, 2], [0, -8, 2]], np.float32)
    results = find_all_multi(
        [model_a, model_b], scene,
        raycast_origins=origins, min_cast_score=0.3,
        policy=policy, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, max_icp_iterations=8, seed=3,
    )
    assert len(results) == 2
    assert len(results[0]) >= 1 and len(results[1]) >= 1
    for matches, (r, t) in zip(results, [(r1, t1), (r2, t2)]):
        tg = np.eye(4, dtype=np.float32)
        tg[:3, :3] = r
        tg[:3, 3] = t
        dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(tg))
        assert float(dt) < 8e-3
        assert float(np.degrees(float(dr))) < 1.0
        assert matches[0].cast_score is not None and matches[0].cast_score > 0.3
