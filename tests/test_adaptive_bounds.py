"""Adaptive RANSAC bound semantics + formerly-dead policy knobs.

Covers the reference's outer-bound sizing (impl/scene.hpp:131-141), the
no-match budget guarantee, ``samples_on_all`` correspondence eligibility
(impl/scene.hpp:534-536), ``query_limit`` / bucket-overflow sampling
(impl/scene.hpp:19,307-310), and ``Model.init(subset)`` semantics
(impl/model.hpp:17-30).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.core.transforms import pose_delta
from triplet_match_tpu.index.model import compile_model, query_pairs
from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
from triplet_match_tpu.search.driver import (
    LAST_SEARCH_STATS,
    adaptive_inner_bound,
    adaptive_outer_bound,
    ball_population_quantile,
    find_all,
    prepare_scene,
)

SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
DISC = DiscretizationParams()


# ---------------------------------------------------------------------------
# adaptive_outer_bound unit behavior (impl/scene.hpp:131-141)
# ---------------------------------------------------------------------------


def test_outer_bound_formula_and_clamps():
    pol = SearchPolicy()
    # log(1-0.999)/log(1-100/10000) = 687.3 -> 687
    assert adaptive_outer_bound(100, 10_000, 50_000, pol) == 687
    # effort scales with eligible scene size
    assert (
        adaptive_outer_bound(100, 100_000, 500_000, pol)
        > 5 * adaptive_outer_bound(100, 10_000, 500_000, pol)
    )
    # lower clamp: tiny scenes fall back to min_sample_count
    assert adaptive_outer_bound(100, 120, 120, pol) == pol.min_sample_count
    # upper clamp: never more than n_scene
    assert adaptive_outer_bound(2, 1_000_000, 300, pol) == 300
    # degenerate: nothing left
    assert adaptive_outer_bound(100, 0, 300, pol) == 0
    # force_exhaustive overrides everything to n_scene
    pol_fx = dataclasses.replace(pol, force_exhaustive=True)
    assert adaptive_outer_bound(100, 10_000, 50_000, pol_fx) == 50_000


def test_outer_bound_model_bigger_than_scene():
    pol = SearchPolicy()
    # outer_prob >= 1 -> min_sample_count (log(0) guard)
    assert adaptive_outer_bound(500, 300, 1_000, pol) == pol.min_sample_count


# ---------------------------------------------------------------------------
# adaptive_inner_bound (impl/scene.hpp:276-282): per-first second-point effort
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def inner_fixture():
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=1200, size=(1, 1, 1), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan))
    sparse, _, _ = embed_in_scene(xyz, nrm, tan, noise=0.002, n_clutter=500, seed=3)
    # fog confined to a tight extent: ball population >> model size, the
    # regime where the reference's inner bound exceeds the static cap
    dense, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.002, n_clutter=8000,
                                    clutter_extent=1.5, seed=5)
    return model, sparse, dense, t_gt


def test_inner_bound_density_regimes(inner_fixture):
    model, sparse, dense, _ = inner_fixture
    pol = SearchPolicy()
    prep_s = prepare_scene(sparse)
    prep_d = prepare_scene(dense)
    # sparse: ball ~ model size -> the reference bound collapses to
    # min_sample_count, well under the static cap
    assert adaptive_inner_bound(prep_s, model, pol) == pol.min_sample_count
    # dense fog: -log(1-p)*|ball|/n_model_all > 32 (the round-2 static cap)
    b = adaptive_inner_bound(prep_d, model, pol)
    assert b > pol.num_second_samples
    # force_exhaustive: bound = ball population (>> probabilistic bound)
    pol_fx = dataclasses.replace(pol, force_exhaustive=True)
    assert adaptive_inner_bound(prep_d, model, pol_fx) > b
    # empty eligibility degenerates to min_sample_count
    empty = dataclasses.replace(prep_s, tangent_mask=jnp.zeros_like(prep_s.tangent_mask))
    assert adaptive_inner_bound(empty, model, pol) == pol.min_sample_count


def test_find_all_raises_effective_b2_in_dense_scenes(inner_fixture):
    model, sparse, dense, t_gt = inner_fixture
    # max_second_samples bounds the CPU cost of the raised round; the raise
    # itself (32 -> 64) is what's under test
    pol = SearchPolicy(num_first_samples=64, score_neighbors=256, finalists=2,
                       query_cap=8, max_second_samples=64)
    # sparse scene: the default cap stands
    find_all(model, sparse, model_match_factor=0.5, policy=pol, seed=0)
    assert LAST_SEARCH_STATS["num_second_samples_effective"] == pol.num_second_samples
    # dense scene: raised to the next power of two, capped, and the
    # instance is still found
    matches = find_all(model, dense, model_match_factor=0.5, policy=pol, seed=0)
    eff = LAST_SEARCH_STATS["num_second_samples_effective"]
    assert eff > pol.num_second_samples
    assert eff <= pol.max_second_samples
    assert eff & (eff - 1) == 0, "effective b2 must be a power of two"
    assert matches, "dense-fog instance not found"
    # opting out restores the static cap
    pol_off = dataclasses.replace(pol, adaptive_second_samples=False)
    find_all(model, dense, model_match_factor=0.5, policy=pol_off, seed=0)
    assert LAST_SEARCH_STATS["num_second_samples_effective"] == pol.num_second_samples


# ---------------------------------------------------------------------------
# find_all phase semantics
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def box():
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    return xyz, nrm, tan


def test_no_match_exhausts_adaptive_budget(box):
    """A matchless scene must consume ceil(outer_bound/B1) rounds, not one."""
    xyz, nrm, tan = box
    policy = SearchPolicy(
        num_first_samples=32, num_second_samples=8, query_cap=8,
        score_neighbors=256, finalists=2, max_rounds=64,
    )
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                          policy, pair_block=128)
    # matchless scene with PLENTY of eligible edge points: a differently
    # sized box (features are scale-variant, so its pairs miss the model's
    # buckets) plus smooth clutter
    oxyz, onrm, otan = make_box_model(n_edge=400, n_face=800,
                                      size=(2.3, 1.7, 1.25), seed=4)
    scene, _, _ = embed_in_scene(
        oxyz, onrm, otan, noise=0.001, n_clutter=800, clutter_extent=6.0, seed=5
    )
    clutter = scene
    prep = prepare_scene(clutter, policy)
    matches = find_all(
        model, clutter, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=3, seed=13, prep=prep,
    )
    assert matches == []
    n_left = int(np.asarray(prep.tangent_mask & prep.cloud.valid).sum())
    bound = adaptive_outer_bound(int(model.n_edge), n_left, n_left, policy)
    expect_rounds = max(1, -(-bound // policy.num_first_samples))
    assert LAST_SEARCH_STATS["rounds"] >= expect_rounds
    assert LAST_SEARCH_STATS["phases"] == 1


def test_match_found_across_phase_rounds(box):
    """A present instance is found even when one round's firsts can miss it."""
    xyz, nrm, tan = box
    policy = SearchPolicy(
        num_first_samples=16, num_second_samples=8, query_cap=8,
        score_neighbors=256, finalists=2, max_rounds=64,
    )
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                          policy, pair_block=128)
    scene, t_gt, _ = embed_in_scene(
        xyz, nrm, tan, noise=0.001, n_clutter=1500, clutter_extent=6.0, seed=6
    )
    matches = find_all(
        model, scene, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=5, seed=13,
    )
    assert matches, "instance not found within the adaptive budget"
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 6e-3
    assert float(np.degrees(float(dr))) < 0.5


def test_dist_thres_defaults_to_corr_dist_factor(box):
    xyz, nrm, tan = box
    policy = SearchPolicy(
        num_first_samples=32, num_second_samples=8, query_cap=8,
        score_neighbors=256, finalists=2, max_rounds=8,
    )
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                          policy, pair_block=128)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=300, seed=7)
    m_default = find_all(
        model, scene, model_match_factor=0.5,  # no dist_thres
        sample_params=SAMPLE, discretization=DISC, policy=policy, seed=13,
    )
    m_explicit = find_all(
        model, scene, dist_thres=policy.corr_dist_factor, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy, seed=13,
    )
    assert len(m_default) == len(m_explicit) and m_default
    np.testing.assert_array_equal(m_default[0].transform, m_explicit[0].transform)


# ---------------------------------------------------------------------------
# samples_on_all (impl/scene.hpp:534-536)
# ---------------------------------------------------------------------------


def test_samples_on_all_restricts_correspondences(box):
    from triplet_match_tpu.search.score import finish_find

    xyz, nrm, tan = box
    policy = SearchPolicy()
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                          policy, pair_block=128)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.0005, n_clutter=100, seed=9)
    prep = prepare_scene(scene, policy)
    consumed = jnp.zeros(scene.xyz.shape[0], bool)
    t = jnp.linalg.inv(jnp.asarray(t_gt))  # scene->model

    all_c = finish_find(model, prep.cloud, prep.tangent_mask, consumed, t, 3.0,
                        samples_on_all=True)
    edge_c = finish_find(model, prep.cloud, prep.tangent_mask, consumed, t, 3.0,
                         samples_on_all=False)
    # tangent-only eligibility strictly reduces the correspondence pool
    assert int(edge_c.count) < int(all_c.count)
    assert int(edge_c.count) > 0
    # every tangent-restricted corr is tangent-bearing
    tn = jnp.linalg.norm(prep.cloud.tangent, axis=-1)
    assert bool(jnp.all(~edge_c.valid | (tn > 0.7)))


# ---------------------------------------------------------------------------
# query_limit + bucket-overflow sampling (impl/scene.hpp:19,307-310)
# ---------------------------------------------------------------------------


def _largest_bucket(m):
    from triplet_match_tpu.features import pairfeat as pf

    keys = np.asarray(m.keys)[: int(m.pair_count)]
    pairs = np.asarray(m.pairs)[: int(m.pair_count)]
    vals, counts = np.unique(keys, return_counts=True)
    key = vals[np.argmax(counts)]
    sel = keys == key
    i, j = pairs[sel][0]
    xyz, tan = m.cloud.xyz, m.cloud.tangent
    f = pf.pair_feature(xyz[i], xyz[j], tan[i], tan[j])
    return f, pairs[sel], int(counts.max())


def test_query_overflow_strided_covers_bucket(box):
    xyz, nrm, tan = box
    policy = SearchPolicy()
    m = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                      policy, pair_block=128)
    f, bucket, blen = _largest_bucket(m)
    cap = 8
    assert blen > cap, "fixture bucket too small for the overflow test"
    got, valid = query_pairs(m, f[None, :], DISC, cap)
    got = np.asarray(got[0])[np.asarray(valid[0])]
    # strided positions reach the bucket tail, not just the front
    want = {tuple(p) for p in bucket}
    assert all(tuple(p) in want for p in got)
    front = {tuple(p) for p in bucket[:cap]}
    assert {tuple(p) for p in got} != front, "overflow still front-truncates"
    # stride positions are exactly floor(i*len/cap)
    pos = (np.arange(cap) * blen) // cap
    np.testing.assert_array_equal(got, bucket[pos])


def test_query_limit_caps_considered_entries(box):
    xyz, nrm, tan = box
    policy = SearchPolicy()
    m = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                      policy, pair_block=128)
    f, bucket, blen = _largest_bucket(m)
    cap = 8
    limit = cap // 2
    got, valid = query_pairs(m, f[None, :], DISC, cap, limit=limit)
    # only `limit` slots valid, even-strided over the WHOLE bucket (the
    # stride spans [0, blen) regardless of which of cap/limit binds, so the
    # tail of an over-limit bucket is never permanently hidden)
    assert int(np.asarray(valid).sum()) == limit
    got = np.asarray(got[0])[np.asarray(valid[0])]
    pos = (np.arange(limit) * blen) // limit
    np.testing.assert_array_equal(got, bucket[pos])
    # and the sequential policy oracle reads the identical entry set
    from triplet_match_tpu.search.oracle import _NpModel, PolicyOracle

    class _P:
        query_cap = cap
        query_limit = limit

    orc = PolicyOracle.__new__(PolicyOracle)
    orc.m = _NpModel(m)
    orc.disc = DISC
    orc.policy = _P()
    orc.bucket_read = "driver"
    np.testing.assert_array_equal(np.asarray(orc.query(np.asarray(f))), got)
    # ...while the default "reference" read keeps upstream's candidate
    # richness: the first query_limit entries in table order
    orc.bucket_read = "reference"
    np.testing.assert_array_equal(
        np.asarray(orc.query(np.asarray(f))), bucket[:limit]
    )


# ---------------------------------------------------------------------------
# Model.init(subset) semantics (impl/model.hpp:17-30)
# ---------------------------------------------------------------------------


def test_subset_restricts_pair_table_not_scoring(box):
    from triplet_match_tpu.api import Model

    xyz, nrm, tan = box
    full = Model(PointCloud.from_arrays(xyz, nrm, tan), DISC).init(SAMPLE)
    half = np.arange(0, xyz.shape[0], 2)  # every other point (edges included)
    sub = Model(PointCloud.from_arrays(xyz, nrm, tan), DISC).init(SAMPLE, subset=half)

    # pair table shrinks with the subset...
    assert sub.point_count() < full.point_count()
    assert sub.pair_count() < full.pair_count()
    # ...but the scoring surface (LUT + full cloud) is untouched
    assert int(sub.compiled.n_all) == int(full.compiled.n_all)
    np.testing.assert_array_equal(
        np.asarray(sub.compiled.lut), np.asarray(full.compiled.lut)
    )
    # a point OUTSIDE the subset still resolves through voxel_query
    out_pt = np.asarray(xyz)[-1]
    assert sub.voxel_query(out_pt) == full.voxel_query(out_pt)


def test_fine_rescore_density_switch(inner_fixture, monkeypatch):
    """Fog-density-adaptive survivor rescore (config.adaptive_fine_rescore):
    fog-dominated diameter balls switch the two-phase survivor rescore to
    the full pack (and keep 1/8) — the 500k config-4 fix; low-density
    scenes keep the fast fine_coarse block."""
    from triplet_match_tpu.search import driver as drv

    model, sparse, _, _ = inner_fixture
    pol = SearchPolicy(num_first_samples=32, num_second_samples=8,
                       query_cap=4, score_neighbors=256, finalists=2,
                       max_rounds=1, adaptive_second_samples=False,
                       scorer="pallas", pallas_interpret=True)
    find_all(model, sparse, model_match_factor=0.5, policy=pol, seed=0)
    assert LAST_SEARCH_STATS["fine_rescore_full"] is False
    assert LAST_SEARCH_STATS["ball_population_q95"] > 0

    # force the fog-dominated regime through the shared density statistic
    monkeypatch.setattr(drv, "ball_population_quantile", lambda *a, **k: 1.0e9)
    find_all(model, sparse, model_match_factor=0.5, policy=pol, seed=0)
    assert LAST_SEARCH_STATS["fine_rescore_full"] is True
    # ... and the finalist funnel widens with it (4M envelope-edge fix: a
    # fog-dominated ranking's count margins are noise, so the true pose
    # only needs to CRACK the finalist set — acceptance gates each
    # finalist with exact full-scene counts; evidence_r4/prof4m.log)
    assert LAST_SEARCH_STATS["finalist_funnel"] >= 16
    # ... bounded by the exact-count prescreen: the widened set is ranked by
    # one full-scene relaxed count each and cut back to the BASE funnel
    # before the scene-sized relaxed-ICP join (4M single-program runtime
    # fix; evidence_r4/scaling_r.log) — so the join width seen by the
    # acceptance stats stays at the base 2
    assert LAST_SEARCH_STATS["finalist_prescreen"] == 2
    assert (LAST_SEARCH_STATS["finalists"]
            == 2 * LAST_SEARCH_STATS["rounds"])

    # opting out keeps the block rescore even in the dense regime
    pol_off = dataclasses.replace(pol, adaptive_fine_rescore=False)
    find_all(model, sparse, model_match_factor=0.5, policy=pol_off, seed=0)
    assert LAST_SEARCH_STATS["fine_rescore_full"] is False


def test_ball_quantile_memo_keys_on_masks(inner_fixture):
    """A mask-patched prep sharing the xyz array must not reuse the stale
    density memo (review round 3): find_all_multi swaps `valid` between
    searches while the xyz object identity stays the same."""
    model, sparse, dense, _ = inner_fixture
    prep_d = prepare_scene(dense)
    q_full = ball_population_quantile(prep_d, model)
    assert q_full > 0.0
    masked = dataclasses.replace(
        prep_d, tangent_mask=jnp.zeros_like(prep_d.tangent_mask))
    assert ball_population_quantile(masked, model) == 0.0
    assert ball_population_quantile(prep_d, model) == q_full
