"""Degenerate and hostile inputs must fail soft (empty result), never crash.

The reference inherits PCL's behavior here (segfaults/asserts on empty
kd-trees are a known failure mode of the C++ stack); a production service
needs the library surface to survive tangent-free scenes, NaN-contaminated
clouds, and scenes smaller than the scoring capacities.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.core.transforms import pose_delta
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
from triplet_match_tpu.search.driver import find_all


POLICY = SearchPolicy(
    num_first_samples=48,
    num_second_samples=16,
    query_cap=8,
    score_neighbors=256,
    finalists=4,
    max_rounds=2,
)
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
DISC = DiscretizationParams()


@pytest.fixture(scope="module")
def model():
    xyz, nrm, tan = make_box_model(n_edge=180, n_face=540, size=(1.0, 0.8, 0.6), seed=0)
    return compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                         POLICY, pair_block=128)


def test_scene_without_edge_points_returns_empty(model):
    """A tangent-free scene (normals only — e.g. a user forgot
    --estimate-tangents) has zero eligible first points: find_all must
    return [] without sampling garbage or dividing by the empty ball."""
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-2, 2, (2000, 3)).astype(np.float32)
    nrm = rng.normal(size=(2000, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    scene = PointCloud.from_arrays(xyz, nrm, np.zeros_like(xyz))
    matches = find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                       sample_params=SAMPLE, discretization=DISC,
                       policy=POLICY, max_icp_iterations=3, seed=1)
    assert matches == []


def test_scene_smaller_than_score_neighbors(model):
    """Scene point count below score_neighbors (K=256) exercises the
    (capacity, mask) padding through sampling, scoring and acceptance."""
    xyz, nrm, tan = make_box_model(n_edge=60, n_face=120, size=(1.0, 0.8, 0.6), seed=0)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=20,
                                    clutter_extent=4.0, seed=5)
    assert scene.capacity < POLICY.score_neighbors
    matches = find_all(model, scene, dist_thres=3.0, model_match_factor=0.3,
                       sample_params=SAMPLE, discretization=DISC,
                       policy=POLICY, max_icp_iterations=5, seed=2)
    # a tiny subsampled instance may or may not clear the acceptance gate;
    # the contract under test is "no crash + any returned pose is sound"
    for m in matches:
        dt, dr = pose_delta(jnp.asarray(m.transform), jnp.asarray(t_gt))
        assert float(dt) < 0.05


def test_nan_contaminated_scene_is_filtered(model):
    """NaN/inf points must be dropped by the validity masks end-to-end
    (the reference's finite filter, impl/model.hpp:17-21) — a planted
    instance in an otherwise NaN-polluted scene is still found."""
    xyz, nrm, tan = make_box_model(n_edge=180, n_face=540, size=(1.0, 0.8, 0.6), seed=0)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=400,
                                    clutter_extent=5.0, seed=7)
    sx = np.asarray(scene.xyz).copy()
    sn = np.asarray(scene.normal).copy()
    st = np.asarray(scene.tangent).copy()
    rng = np.random.default_rng(3)
    # corrupt 5% of the CLUTTER points (instance points stay clean)
    n_inst = xyz.shape[0]
    bad = rng.choice(np.arange(n_inst, sx.shape[0]), size=sx.shape[0] // 20,
                     replace=False)
    sx[bad[::2]] = np.nan
    sx[bad[1::2]] = np.inf
    polluted = PointCloud.from_arrays(sx, sn, st)
    assert int(polluted.valid.sum()) < sx.shape[0]
    matches = find_all(model, polluted, dist_thres=3.0, model_match_factor=0.5,
                       sample_params=SAMPLE, discretization=DISC,
                       policy=POLICY, max_icp_iterations=5, seed=3)
    assert matches, "planted instance lost to NaN pollution"
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 6e-3
    assert float(np.degrees(float(dr))) < 0.6


def test_nan_contaminated_model_compiles(model):
    """compile_model drops non-finite model points up front."""
    xyz, nrm, tan = make_box_model(n_edge=180, n_face=540, size=(1.0, 0.8, 0.6), seed=0)
    xyz = xyz.copy()
    xyz[::50] = np.nan
    m = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                      POLICY, pair_block=128)
    assert int(m.cloud.valid.sum()) < xyz.shape[0]
    assert np.isfinite(float(m.diameter)) and float(m.diameter) > 0


def test_model_match_factor_above_one_finds_nothing(model):
    """An impossible acceptance bar (possible_model * factor > K) must
    terminate cleanly once the adaptive budget exhausts, not loop."""
    xyz, nrm, tan = make_box_model(n_edge=180, n_face=540, size=(1.0, 0.8, 0.6), seed=0)
    scene, _, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=200,
                                 clutter_extent=5.0, seed=9)
    matches = find_all(model, scene, dist_thres=3.0, model_match_factor=2.0,
                       sample_params=SAMPLE, discretization=DISC,
                       policy=POLICY, max_icp_iterations=3, seed=4)
    assert matches == []


def test_knn_fewer_valid_points_than_k_masks_tails():
    """Scan-init filler candidates must never surface as phantom neighbors.

    With fewer valid reference points than k, the candidate scan leaves
    slots at its init value (index 0); those must come back with huge
    sqdists, not finite duplicates of point 0 that evict real neighbors
    (review round 3)."""
    from triplet_match_tpu.ops.knn import knn, radius_neighbors

    rng = np.random.default_rng(0)
    r = rng.normal(size=(20, 3)).astype(np.float32)
    valid = np.zeros(20, bool)
    valid[:5] = True
    q = r[:3] + 0.01
    idx, d2 = knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid), 10)
    finite = np.asarray(d2[0]) < 1e30
    assert finite.sum() == 5
    assert sorted(np.asarray(idx[0])[finite].tolist()) == [0, 1, 2, 3, 4]
    _, mask = radius_neighbors(jnp.asarray(q), jnp.asarray(r),
                               jnp.asarray(valid), 100.0, 10)
    assert int(np.asarray(mask[0]).sum()) == 5


def test_knn_k_larger_than_reference_capacity():
    """k above the reference array capacity pads with huge sqdists instead
    of crashing lax.top_k (review round 3; principal_curvatures defaults
    k=30, so tiny clouds hit this)."""
    from triplet_match_tpu.ops.knn import knn

    rng = np.random.default_rng(1)
    r = rng.normal(size=(20, 3)).astype(np.float32)
    q = r[:4]
    idx, d2 = knn(jnp.asarray(q), jnp.asarray(r), jnp.ones(20, bool), 30)
    assert idx.shape == (4, 30)
    assert int((np.asarray(d2[0]) < 1e30).sum()) == 20


def test_default_policy_on_tiny_scene_does_not_crash(model):
    """Scenes smaller than num_first_samples (default 256) must search,
    not crash top_k inside the jitted round (review round 3)."""
    from triplet_match_tpu.config import SearchPolicy as SP

    xyz, nrm, tan = make_box_model(n_edge=60, n_face=120, size=(1.0, 0.8, 0.6), seed=2)
    scene = PointCloud.from_arrays(xyz, nrm, tan)  # 180 points << 256
    pol = SP(max_rounds=1)
    matches = find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                       sample_params=SAMPLE, discretization=DISC,
                       policy=pol, max_icp_iterations=3, seed=1)
    assert isinstance(matches, list)


def test_compile_model_with_fully_duplicated_points_warns():
    """Exactly duplicated points (a merge artifact) drive the mean 1-NN
    resolution to 0; compile must warn and fall back to a bbox-derived
    scale instead of blowing up to NaN/negative voxel extents."""
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=240, size=(1.0, 0.8, 0.6), seed=4)
    xyz2 = np.concatenate([xyz, xyz])
    nrm2 = np.concatenate([nrm, nrm])
    tan2 = np.concatenate([tan, tan])
    with pytest.warns(UserWarning, match="resolution is 0"):
        m = compile_model(PointCloud.from_arrays(xyz2, nrm2, tan2), DISC, SAMPLE,
                          POLICY, pair_block=128)
    assert float(m.resolution) > 0
    assert all(e > 0 for e in m.extents)
