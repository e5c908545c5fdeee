"""Pallas scorer parity tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
from triplet_match_tpu.search.driver import prepare_scene
from triplet_match_tpu.search.score_pallas import (
    pack_groups,
    pack_model,
    poses_to_rows,
    score_groups_exact_jnp,
    score_groups_pallas,
)

POLICY = SearchPolicy()
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
DISC = DiscretizationParams()


@pytest.fixture(scope="module")
def setup():
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=360, size=(1.0, 0.8, 0.6), seed=0)
    model_cloud = PointCloud.from_arrays(xyz, nrm, tan)
    model = compile_model(model_cloud, DISC, SAMPLE, POLICY, pair_block=128)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=200, seed=7)
    prep = prepare_scene(scene, POLICY)

    g, hg, k = 2, 8, 128
    rng = np.random.default_rng(3)
    n = prep.cloud.xyz.shape[0]
    nbr_idx = rng.integers(0, n, (g, k)).astype(np.int32)
    nbr_valid = rng.random((g, k)) > 0.1

    t_inv = np.linalg.inv(np.asarray(t_gt)).astype(np.float32)
    ts = np.tile(t_inv, (g, hg, 1, 1))
    # mix of near-true poses and junk
    ts[:, : hg // 2, :3, 3] += rng.normal(0, 0.002, (g, hg // 2, 3)).astype(np.float32)
    ts[:, hg // 2 :, :3, 3] += rng.normal(0, 1.0, (g, hg - hg // 2, 3)).astype(np.float32)

    consumed = jnp.zeros(n, bool)
    return model, prep, jnp.asarray(ts), jnp.asarray(nbr_idx), jnp.asarray(nbr_valid), consumed


def test_pallas_matches_jnp_exact(setup):
    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2

    mpack = pack_model(model)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)

    s_pl, c_pl = score_groups_pallas(
        mpack, groups, rows, thres2, mode="full", pose_tile=4, interpret=True
    )
    s_ref, c_ref = score_groups_exact_jnp(
        model, scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid, ts, 3.0
    )
    np.testing.assert_array_equal(np.asarray(c_pl), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


def test_pallas_count_mode(setup):
    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)
    s_cnt, c_cnt = score_groups_pallas(
        mpack, groups, rows, thres2, mode="count", pose_tile=4, interpret=True
    )
    _, c_ref = score_groups_exact_jnp(
        model, scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid, ts, 3.0
    )
    np.testing.assert_array_equal(np.asarray(c_cnt), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_cnt), np.asarray(c_cnt).astype(np.float32))


def test_find_all_with_pallas_scorer(setup):
    """The integrated driver path (scorer='pallas', interpret mode on CPU)
    recovers the same pose as the jnp scorer path."""
    import dataclasses

    from triplet_match_tpu.core.transforms import pose_delta
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import find_all

    model, prep, *_ = setup
    policy = dataclasses.replace(
        POLICY,
        num_first_samples=32, num_second_samples=8, query_cap=8,
        score_neighbors=128, finalists=2, max_rounds=2,
        scorer="pallas", pallas_interpret=True,
    )
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=360, size=(1.0, 0.8, 0.6), seed=0)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=200, seed=7)
    matches = find_all(
        model, scene, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=5, seed=13,
    )
    assert matches
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 6e-3
    assert float(np.degrees(float(dr))) < 0.6


def test_two_phase_keeps_good_poses(setup):
    """Two-phase (coarse subsample + rescore) must keep near-true poses and
    give them their full-K scores."""
    from triplet_match_tpu.search.score_pallas import score_groups_two_phase

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)
    s_full, c_full = score_groups_pallas(
        mpack, groups, rows, thres2, mode="count", pose_tile=4, interpret=True
    )
    s_2p, c_2p = score_groups_two_phase(
        mpack, groups, rows, thres2, mode="count", pose_tile=4,
        coarse_stride=4, keep_frac=2, interpret=True,
    )
    s_full, s_2p = np.asarray(s_full), np.asarray(s_2p)
    # the per-group best full-score pose survives and keeps its exact score
    for g in range(s_full.shape[0]):
        b = int(np.argmax(s_full[g]))
        assert s_2p[g, b] == s_full[g, b]
    # dropped poses are marked -1
    assert (s_2p == -1.0).any()


def test_true_pose_scores_higher_than_junk(setup):
    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    _, c = score_groups_pallas(
        mpack, groups, poses_to_rows(ts), thres2, mode="count", pose_tile=4, interpret=True
    )
    c = np.asarray(c)
    hg = c.shape[1]
    assert c[:, : hg // 2].min() > c[:, hg // 2 :].max()


def test_find_all_two_phase_pallas(setup):
    """Driver two-phase scoring path (score_neighbors >= 256 turns it on)."""
    import dataclasses

    from triplet_match_tpu.core.transforms import pose_delta
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import find_all

    model, prep, *_ = setup
    policy = dataclasses.replace(
        POLICY,
        num_first_samples=16, num_second_samples=8, query_cap=8,  # 64 poses/group
        score_neighbors=256, finalists=2, max_rounds=2,
        scorer="pallas", pallas_interpret=True, two_phase_scoring=True,
    )
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=360, size=(1.0, 0.8, 0.6), seed=0)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=200, seed=7)
    matches = find_all(
        model, scene, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=5, seed=13,
    )
    assert matches
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 6e-3
    assert float(np.degrees(float(dr))) < 0.6


def test_two_phase_invalid_poses_cannot_evict_valid(setup):
    """Invalid hypotheses must not occupy coarse-phase keep slots.

    An invalid hypothesis's transform is arbitrary (failed pair gate, padded
    query slot) and can coarse-score arbitrarily high; with keep slots filled
    by invalid near-true poses, a valid pose would be dropped to -1 forever.
    """
    from triplet_match_tpu.search.score_pallas import score_groups_two_phase

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)

    g, hg = ts.shape[:2]
    # every pose is the near-true (high-scoring) pose...
    ts_all = jnp.broadcast_to(ts[:, :1], (g, hg, 4, 4))
    # ...but only the LAST pose per group is a valid hypothesis
    ok = jnp.zeros((g, hg), bool).at[:, -1].set(True)

    # keep = pose_tile = 4 slots out of hg=8: without masking, invalid
    # copies (indices 0..3 win top_k ties) fill all keep slots
    s, c = score_groups_two_phase(
        mpack, groups, poses_to_rows(ts_all), thres2, ok,
        mode="count", pose_tile=4, coarse_stride=4, keep_frac=2, interpret=True,
    )
    s, c = np.asarray(s), np.asarray(c)
    s_ref, c_ref = score_groups_pallas(
        mpack, groups, poses_to_rows(ts_all), thres2, mode="count",
        pose_tile=4, interpret=True,
    )
    # the valid pose survives with its full score; all invalid ones are -1
    np.testing.assert_array_equal(s[:, -1], np.asarray(s_ref)[:, -1])
    assert (s[:, :-1] == -1.0).all()
    assert (c[:, :-1] == 0).all()


def test_two_phase_coarse_model_keeps_good_poses(setup):
    """Coarse-MODEL phase 1 (narrow blocks + inflated gate) must still keep
    the per-group winners and hand them their exact full-pack scores."""
    from triplet_match_tpu.search.score_pallas import score_groups_two_phase

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model, coarse_points=128)
    assert mpack.md_coarse.shape[1] <= mpack.md_edge.shape[1] + mpack.md_surf.shape[1]
    assert float(mpack.coarse_slack) > 0.0
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)
    s_full, _ = score_groups_pallas(
        mpack, groups, rows, thres2, mode="count", pose_tile=4, interpret=True
    )
    s_2p, _ = score_groups_two_phase(
        mpack, groups, rows, thres2, mode="count", pose_tile=4,
        coarse_stride=4, keep_frac=2, interpret=True, coarse_model=True,
    )
    s_full, s_2p = np.asarray(s_full), np.asarray(s_2p)
    for g in range(s_full.shape[0]):
        b = int(np.argmax(s_full[g]))
        assert s_2p[g, b] == s_full[g, b]
    assert (s_2p == -1.0).any()


def test_two_phase_fine_stride_keeps_winner(setup):
    """fine_stride > 1 rescores survivors on a subsampled neighborhood:
    phase-1 survival is unchanged, so the full-score winner still gets a
    (strided-count) score instead of -1, at roughly count/stride."""
    from triplet_match_tpu.search.score_pallas import score_groups_two_phase

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)
    s_full, _ = score_groups_pallas(
        mpack, groups, rows, thres2, mode="count", pose_tile=4, interpret=True
    )
    s_fs, c_fs = score_groups_two_phase(
        mpack, groups, rows, thres2, mode="count", pose_tile=4,
        coarse_stride=4, keep_frac=2, interpret=True, fine_stride=2,
    )
    s_full, s_fs = np.asarray(s_full), np.asarray(s_fs)
    for g in range(s_full.shape[0]):
        b = int(np.argmax(s_full[g]))
        assert s_fs[g, b] >= 0.0  # survived and rescored
        # strided counts are about count/stride (sampling the same ball)
        assert s_fs[g, b] <= s_full[g, b]


def test_coarse_phase_never_pessimistic(setup):
    """Per pose, the coarse-block count at the slack-inflated gate bounds the
    full-pack count from above: a pose that scores on the full pack cannot be
    missed by phase 1 (the no-miss guarantee pack_model documents)."""
    from triplet_match_tpu.search.score_pallas import score_groups_coarse

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres = 3.0 * float(model.resolution)
    mpack = pack_model(model, coarse_points=128)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)
    _, c_full = score_groups_pallas(
        mpack, groups, rows, thres * thres, mode="count", pose_tile=4, interpret=True
    )
    t2c = (thres + float(mpack.coarse_slack)) ** 2
    c_coarse = score_groups_coarse(
        mpack, groups, rows, t2c, pose_tile=4, interpret=True
    )
    # floor() strips the fractional strict-gate tiebreak term (ROADMAP 3d5)
    # and recovers the integer inflated-gate count
    c_coarse_n = np.floor(np.asarray(c_coarse))
    assert (c_coarse_n >= np.asarray(c_full).astype(np.float32)).all()
    # the MXU-reduction variant matches the integer count (it exists as a
    # measured negative result — see _coarse_kernel docstring; no tiebreak)
    c_mxu = score_groups_coarse(
        mpack, groups, rows, t2c, pose_tile=4, interpret=True, reduce="mxu"
    )
    np.testing.assert_array_equal(c_coarse_n, np.asarray(c_mxu))
    # and the coarse counts are not vacuous: junk poses stay near zero
    hg = ts.shape[1]
    c = np.asarray(c_coarse)
    assert c[:, : hg // 2].min() > c[:, hg // 2 :].max()


def test_pack_model_caps_big_models(setup):
    """Big models are voxel-downsampled to a coverage-uniform kernel pack."""
    from triplet_match_tpu.search.score_pallas import _coverage_subsample

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    n_valid = int(np.asarray(model.cloud.valid).sum())
    cap = 256
    assert n_valid > cap

    mpack = pack_model(model, max_points=cap)
    assert mpack.channels_d.shape[1] <= ((cap + 127) // 128) * 128

    # subsample is coverage-uniform: its max NN-gap grows at most ~3x the
    # sqrt(n/cap) prediction over the valid cloud
    keep = _coverage_subsample(
        np.asarray(model.cloud.xyz), np.asarray(model.cloud.valid), cap
    )
    assert keep.size <= cap
    from triplet_match_tpu.ops.knn import nn1

    sub = jnp.asarray(np.asarray(model.cloud.xyz)[keep])
    all_xyz = model.cloud.xyz
    _, d2 = nn1(all_xyz, sub, jnp.ones(sub.shape[0], bool))
    cover = float(jnp.sqrt(jnp.max(jnp.where(model.cloud.valid, d2, 0.0))))
    assert cover < 8.0 * float(model.resolution) * np.sqrt(n_valid / cap)

    # ranking still works on the capped pack: near-true poses beat junk
    groups = pack_groups(prep.cloud, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    thres2 = (3.0 * float(model.resolution)) ** 2
    _, c = score_groups_pallas(
        mpack, groups, poses_to_rows(ts), thres2, mode="count", pose_tile=4,
        interpret=True,
    )
    c = np.asarray(c)
    hg = c.shape[1]
    assert c[:, : hg // 2].min() > c[:, hg // 2 :].max()


def test_weighted_negative_knobs_reach_pallas_ranking(setup):
    """weighted_distance / negative_scores reach the Pallas scorer
    (VERDICT r2 weak #3): count-mode scores become the weighted/signed
    sums the reference would rank by (impl/scene.hpp:468-475), matching
    the jnp exact-NN oracle with the same knobs."""
    from triplet_match_tpu.search.score_pallas import score_groups_two_phase

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)

    for wd, ns in [(True, False), (False, True), (True, True)]:
        s_pl, c_pl = score_groups_pallas(
            mpack, groups, rows, thres2, mode="count", pose_tile=4,
            interpret=True, weighted_distance=wd, negative_scores=ns,
        )
        s_ref, c_ref = score_groups_exact_jnp(
            model, scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid, ts,
            3.0, weighted_distance=wd, negative_scores=ns, orientation=False,
        )
        np.testing.assert_array_equal(np.asarray(c_pl), np.asarray(c_ref))
        np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-5)
        # ranking order must agree between kernel and oracle
        np.testing.assert_array_equal(
            np.argsort(-np.asarray(s_pl), axis=1, kind="stable"),
            np.argsort(-np.asarray(s_ref), axis=1, kind="stable"),
        )

    # full mode with both knobs matches the oracle too
    s_fl, c_fl = score_groups_pallas(
        mpack, groups, rows, thres2, mode="full", pose_tile=4,
        interpret=True, weighted_distance=True, negative_scores=True,
    )
    s_rf, c_rf = score_groups_exact_jnp(
        model, scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid, ts,
        3.0, weighted_distance=True, negative_scores=True,
    )
    np.testing.assert_array_equal(np.asarray(c_fl), np.asarray(c_rf))
    np.testing.assert_allclose(np.asarray(s_fl), np.asarray(s_rf), rtol=2e-4, atol=2e-4)

    # two-phase honors the knobs in the survivor rescore, and its drop
    # sentinel sits below any signed score
    s_2p, _ = score_groups_two_phase(
        mpack, groups, rows, thres2, mode="count", pose_tile=4,
        coarse_stride=4, keep_frac=4, interpret=True,
        weighted_distance=True, negative_scores=True,
    )
    s_2p = np.asarray(s_2p)
    survivors = s_2p > -1.0e11
    assert survivors.any()
    ref = np.asarray(score_groups_exact_jnp(
        model, scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid, ts,
        3.0, weighted_distance=True, negative_scores=True, orientation=False,
    )[0])
    np.testing.assert_allclose(s_2p[survivors], ref[survivors], rtol=1e-5, atol=1e-5)


def test_coarse_linear_matches_direct(setup):
    """The pose-linearized coarse ranker (score_groups_coarse_linear,
    ROADMAP 3d lever b) is a drop-in for the direct coarse kernel:
    identical hit counts in interpret (f32) mode."""
    from triplet_match_tpu.search.score_pallas import (
        score_groups_coarse,
        score_groups_coarse_linear,
        score_groups_two_phase,
    )

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres = 3.0 * float(model.resolution)
    mpack = pack_model(model)
    t2c = (thres + float(mpack.coarse_slack)) ** 2
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)

    c_dir = score_groups_coarse(mpack, groups, rows, t2c, pose_tile=4, interpret=True)
    c_lin = score_groups_coarse_linear(mpack, groups, rows, t2c, pose_tile=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(c_dir), np.asarray(c_lin))

    # and through the two-phase path the final scores agree as well
    thres2 = thres * thres
    s_a, c_a = score_groups_two_phase(
        mpack, groups, rows, thres2, pose_tile=4, coarse_stride=4, keep_frac=4,
        interpret=True, coarse_linear=False,
    )
    s_b, c_b = score_groups_two_phase(
        mpack, groups, rows, thres2, pose_tile=4, coarse_stride=4, keep_frac=4,
        interpret=True, coarse_linear=True,
    )
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_b))


def test_full_mode_ranking_via_two_phase(setup):
    """Orientation-weighted (full-mode) RANKING at production structure
    (VERDICT r2 #8): coarse count screen, full-mode rescore on survivors
    only.  Survivor scores must equal the all-pose full-mode kernel's."""
    import dataclasses

    from triplet_match_tpu.search.score_pallas import score_groups_two_phase

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)

    s_2p, c_2p = score_groups_two_phase(
        mpack, groups, rows, thres2, mode="full", pose_tile=4,
        coarse_stride=4, keep_frac=4, interpret=True,
    )
    s_full, c_full = score_groups_pallas(
        mpack, groups, rows, thres2, mode="full", pose_tile=4, interpret=True,
    )
    s_2p, c_2p = np.asarray(s_2p), np.asarray(c_2p)
    surv = s_2p >= 0.0
    assert surv.any()
    np.testing.assert_allclose(s_2p[surv], np.asarray(s_full)[surv], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(c_2p[surv], np.asarray(c_full)[surv])

    # the integrated driver path with ranking_mode="full" still finds the pose
    from triplet_match_tpu.core.transforms import pose_delta
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import find_all

    policy = dataclasses.replace(
        POLICY,
        num_first_samples=32, num_second_samples=8, query_cap=8,
        score_neighbors=256, finalists=2, max_rounds=2,
        scorer="pallas", pallas_interpret=True, ranking_mode="full",
    )
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=360, size=(1.0, 0.8, 0.6), seed=0)
    scene2, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=200, seed=7)
    matches = find_all(
        model, scene2, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=5, seed=13,
    )
    assert matches
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 6e-3 and float(np.degrees(float(dr))) < 0.6


def test_fine_coarse_survivor_ranking(setup):
    """Survivor ranking against the medium 4-D block (fine_coarse): the
    no-miss contract means near-true poses rank at the top exactly as with
    the full-pack rescore, and the integrated driver still recovers the
    pose."""
    import dataclasses

    from triplet_match_tpu.search.score_pallas import score_groups_two_phase

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres2 = (3.0 * float(model.resolution)) ** 2
    mpack = pack_model(model)
    assert float(mpack.fine_slack) <= float(mpack.coarse_slack)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)

    s_ref, _ = score_groups_two_phase(
        mpack, groups, rows, thres2, pose_tile=4, coarse_stride=4, keep_frac=4,
        interpret=True,
    )
    s_fc, c_fc = score_groups_two_phase(
        mpack, groups, rows, thres2, pose_tile=4, coarse_stride=4, keep_frac=4,
        interpret=True, fine_coarse=True,
    )
    s_ref, s_fc = np.asarray(s_ref), np.asarray(s_fc)
    # same survivor sets (phase 1 identical), and the best (near-true) pose
    # per group is the same under both rankings
    np.testing.assert_array_equal(s_ref >= 0, s_fc >= 0)
    np.testing.assert_array_equal(np.argmax(s_ref, axis=1), np.argmax(s_fc, axis=1))
    assert (np.asarray(c_fc)[s_fc >= 0] >= 0).all()

    from triplet_match_tpu.core.transforms import pose_delta
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import find_all

    policy = dataclasses.replace(
        POLICY,
        num_first_samples=32, num_second_samples=8, query_cap=8,
        score_neighbors=256, finalists=2, max_rounds=2,
        scorer="pallas", pallas_interpret=True, two_phase_fine_coarse=True,
    )
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=360, size=(1.0, 0.8, 0.6), seed=0)
    scene2, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=200, seed=7)
    matches = find_all(
        model, scene2, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=5, seed=13,
    )
    assert matches
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 6e-3 and float(np.degrees(float(dr))) < 0.6


def test_fine_strict_primary_ranking(setup):
    """strict_primary swaps the ranking keys: floor(score) becomes the
    STRICT-gate count and the inflated no-miss count moves to the
    fractional tiebreak (config.two_phase_fine_strict — decouples phase-2
    pose precision from the fine block's coverage radius, ROADMAP 3d6)."""
    from triplet_match_tpu.search.score_pallas import (
        score_groups_coarse, score_groups_two_phase,
    )

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres = 3.0 * float(model.resolution)
    t2 = thres * thres
    mpack = pack_model(model, coarse_points=128)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)
    k = groups.shape[2]

    t2c = (thres + float(mpack.coarse_slack)) ** 2
    s_def = np.asarray(score_groups_coarse(
        mpack, groups, rows, t2c, t2, pose_tile=4, interpret=True))
    s_str = np.asarray(score_groups_coarse(
        mpack, groups, rows, t2c, t2, pose_tile=4, interpret=True,
        strict_primary=True))
    inflated = np.floor(s_def)
    strict = np.round((s_def - inflated) * (k + 1))
    # swapped composition: strict + inflated/(k+1)
    np.testing.assert_allclose(
        s_str, strict + inflated / (k + 1), rtol=0, atol=1e-3)
    # the strict count never exceeds the inflated count
    assert (strict <= inflated).all()

    # through the pipeline: phase-1 keeps are unchanged and the near-true
    # best pose per group still wins under the strict-primary fine ranking
    s_ref, _ = score_groups_two_phase(
        mpack, groups, rows, t2, pose_tile=4, coarse_stride=4, keep_frac=4,
        interpret=True, fine_coarse=True,
    )
    s_fs, _ = score_groups_two_phase(
        mpack, groups, rows, t2, pose_tile=4, coarse_stride=4, keep_frac=4,
        interpret=True, fine_coarse=True, fine_strict=True,
    )
    s_ref, s_fs = np.asarray(s_ref), np.asarray(s_fs)
    np.testing.assert_array_equal(s_ref >= 0, s_fs >= 0)
    np.testing.assert_array_equal(np.argmax(s_ref, axis=1), np.argmax(s_fs, axis=1))


def test_exact_semantics_bypass_two_phase_screen(setup, monkeypatch):
    """weighted_distance / negative_scores must route AROUND the two-phase
    screen: phase-1's optimistic hit-count keep bounds a kept pose's
    signed/weighted score from above but not below, so a dropped pose's
    signed score could outrank a kept one's.  The driver scores such
    configs through the single-phase epilogue path (exact configured
    semantics over every pose — impl/scene.hpp:468-475)."""
    import dataclasses

    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search import driver as drv
    from triplet_match_tpu.search import score_pallas as sp

    model, prep, *_ = setup
    policy = dataclasses.replace(
        POLICY,
        num_first_samples=16, num_second_samples=8, query_cap=8,
        score_neighbors=256, finalists=2, max_rounds=2,
        scorer="pallas", pallas_interpret=True, two_phase_scoring=True,
        negative_scores=True,
    )
    called = {"two_phase": 0}
    orig = sp.score_groups_two_phase

    def spy(*a, **k):
        called["two_phase"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(sp, "score_groups_two_phase", spy)
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=360, size=(1.0, 0.8, 0.6), seed=0)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=200, seed=7)
    drv.clear_round_cache()
    matches = drv.find_all(
        model, scene, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=5, seed=13,
    )
    assert called["two_phase"] == 0  # routed to the single-phase path
    assert matches


def test_coarse_mxu_reduce_rejects_strict_knobs(setup):
    """reduce='mxu' (the measured-negative MXU hit reduction) has no
    per-point min, so the strict-gate tiebreak / strict-primary weights
    cannot apply — it must raise, not silently mislabel the scores."""
    import pytest

    from triplet_match_tpu.search.score_pallas import score_groups_coarse

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres = 3.0 * float(model.resolution)
    mpack = pack_model(model, coarse_points=128)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)
    t2c = (thres + float(mpack.coarse_slack)) ** 2
    with pytest.raises(ValueError, match="mxu"):
        score_groups_coarse(mpack, groups, rows, t2c, thres * thres,
                            pose_tile=4, interpret=True, reduce="mxu",
                            strict_primary=True)
    with pytest.raises(ValueError, match="mxu"):
        score_groups_coarse(mpack, groups, rows, t2c, thres * thres,
                            pose_tile=4, interpret=True, reduce="mxu")


def test_coarse_tile_and_group_fold_invariance(setup):
    """The VMEM-chunking knobs (auto-shrunk pose tile, multi-group fold)
    regroup identical arithmetic: counts must be bit-identical across every
    (pose_tile, group_block) combination, including tiles the budget would
    shrink and folds that do not divide G evenly (fall back to a divisor).

    Guards the chunked-kernel refactor that fixed the hardware scoped-VMEM
    OOM at fine_stride=1 shapes (evidence_r4/recall131k.log)."""
    from triplet_match_tpu.search.score_pallas import (
        _coarse_tiles,
        score_groups_coarse,
    )

    model, prep, ts, nbr_idx, nbr_valid, consumed = setup
    scene = prep.cloud
    thres = 3.0 * float(model.resolution)
    mpack = pack_model(model, coarse_points=128)
    groups = pack_groups(scene, prep.tangent_mask, consumed, nbr_idx, nbr_valid)
    rows = poses_to_rows(ts)
    t2c = (thres + float(mpack.coarse_slack)) ** 2

    ref = None
    for pt, gb in [(1, 1), (2, 1), (4, 1), (8, 1), (2, 2), (8, 2), (4, 8)]:
        c = np.asarray(score_groups_coarse(
            mpack, groups, rows, t2c, thres * thres, pose_tile=pt,
            group_block=gb, interpret=True,
        ))
        if ref is None:
            ref = c
        else:
            np.testing.assert_array_equal(ref, c, err_msg=f"pt={pt} gb={gb}")

    # the budget math: the worst hardware-OOM family (K=512, Nc=768, PT=32)
    # must pick a MOSAIC-LEGAL pose tile (multiple of 8 or == Hg — the SMEM
    # pose block's second-to-last dim, see evidence_r4/recall131k_v2.log for
    # the lowering error an illegal tile triggers) and a K chunk whose live
    # distance tile fits the budget; the group fold must divide G
    from triplet_match_tpu.search.score_pallas import _COARSE_D2_BUDGET

    pt, gb, kc = _coarse_tiles(g=256, hg=32, k=512, nc=768, pose_tile=32,
                               group_block=8)
    assert pt % 8 == 0 or pt == 32
    assert 32 % pt == 0 and 512 % kc == 0 and (kc % 128 == 0 or kc == 512)
    assert pt * kc * 768 * 4 <= _COARSE_D2_BUDGET
    assert 256 % gb == 0 and gb >= 2
    # Hg with no multiple-of-8 divisor: Hg itself is the only legal tile
    pt, gb, kc = _coarse_tiles(g=7, hg=12, k=64, nc=128, pose_tile=8,
                               group_block=8)
    assert pt == 12 and 7 % gb == 0 and kc == 64
