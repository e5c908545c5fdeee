"""Edge-only ranking in the fog-dominated regime (policy.rank_edges_only).

At 4M-point touching-fog density, poses that embed the model inside a dense
fog patch out-COUNT the true pose at the strict band — the seed-2 true pose
cracks neither a 16- nor a 32-wide finalist funnel under all-point ranking
(evidence_r4/diag4m_s2_*.jsonl) — while being unacceptable by construction:
greedy acceptance requires ``score_t >= match_factor * n_edge``
tangent-bearing correspondences (impl/scene.hpp:193-237) and fog carries no
tangents.  Ranking on edge-eligible points only (the ``samples_on_all=False``
eligibility, impl/scene.hpp:534-536, scoped to the ranking surfaces) makes
fog poses score 0 and restores the true pose's margin.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.core.transforms import invert_rigid, pose_delta
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import fog_patches, make_box_model, rotation_matrix
from triplet_match_tpu.search import driver
from triplet_match_tpu.search.score import finish_find

DISC = DiscretizationParams()
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)


def _fog_scene(n_fog: int, seed: int, extent: float, phantom_pose=None,
               phantom_reps: int = 3):
    """Instance + touching fog concentrated around it (the dense_ab_cpu
    fixture shape: local density matches the 4M regime at CPU scale).

    ``phantom_pose`` = (r_fog [3,3], t_fog [3]): additionally embed a
    tangent-free *phantom surface* — ``phantom_reps`` jittered copies of the
    model surface posed there, with surface normals but NO tangents.  At 4M
    volumetric density random fog statistically covers a posed model's
    strict band this way (evidence_r4/diag4m_s2_*.jsonl); random patches at
    CPU scale cannot (30k fog peaks at ~1.3k in-band corrs vs the true
    pose's ~3.1k), so the blob distills the regime deterministically."""
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    rngc = np.random.default_rng(3000 + seed)
    r_inst = rotation_matrix(rngc.normal(size=3), rngc.uniform(0, np.pi))
    t_off = rngc.uniform(-0.3, 0.3, 3).astype(np.float32)
    c_xyz, c_nrm = fog_patches(rngc, n_fog, seed_base=7000 + 100 * seed, extent=extent)
    if phantom_pose is not None:
        r_fog, t_fog = phantom_pose
        ph_xyz = np.concatenate([
            (xyz @ r_fog.T + t_fog
             + rngc.normal(0, 0.008, xyz.shape)).astype(np.float32)
            for _ in range(phantom_reps)
        ])
        ph_nrm = np.concatenate([nrm @ r_fog.T for _ in range(phantom_reps)]).astype(np.float32)
        c_xyz = np.concatenate([c_xyz, ph_xyz])
        c_nrm = np.concatenate([c_nrm, ph_nrm])
    s_xyz = np.concatenate([
        xyz @ r_inst.T + t_off + rngc.normal(0, 0.001, xyz.shape).astype(np.float32),
        c_xyz,
    ])
    s_nrm = np.concatenate([nrm @ r_inst.T, c_nrm])
    s_tan = np.concatenate([tan @ r_inst.T, np.zeros_like(c_xyz)])
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = r_inst
    t_gt[:3, 3] = t_off
    return (xyz, nrm, tan), PointCloud.from_arrays(s_xyz, s_nrm, s_tan), t_gt


def test_fog_pose_outcounts_true_pose_on_all_points_only():
    """The ranking-inversion mechanism, isolated: a pose placing the model
    inside a dense tangent-free fog blob counts MORE all-point corrs than
    the true pose, but zero edge-only corrs."""
    policy = SearchPolicy()
    # fog pose: model embedded in a dense fog blob, well away from the instance
    r_fog = rotation_matrix([0.2, 1.0, 0.1], 0.7)
    t_fog_pos = np.array([0.55, 0.55, 0.55], np.float32)
    (mx, mn, mt), scene, t_gt = _fog_scene(30000, seed=4, extent=0.9,
                                           phantom_pose=(r_fog, t_fog_pos))
    model = compile_model(PointCloud.from_arrays(mx, mn, mt), DISC, SAMPLE, policy)
    prep = driver.prepare_scene(scene, policy)
    consumed = jnp.zeros(scene.xyz.shape[0], bool)

    t_true = jnp.asarray(invert_rigid(jnp.asarray(t_gt)))
    t_fog_inv = np.eye(4, dtype=np.float32)
    t_fog_inv[:3, :3] = r_fog
    t_fog_inv[:3, 3] = t_fog_pos
    t_fog = jnp.asarray(invert_rigid(jnp.asarray(t_fog_inv)))

    def counts(t, on_all):
        return int(finish_find(model, prep.cloud, prep.tangent_mask, consumed,
                               t, 3.0, samples_on_all=on_all).count)

    true_all, fog_all = counts(t_true, True), counts(t_fog, True)
    true_edge, fog_edge = counts(t_true, False), counts(t_fog, False)
    # the inversion: all-point ranking prefers the fog pose...
    assert fog_all > true_all, (fog_all, true_all)
    # ...edge-only ranking is fog-proof
    assert true_edge > 10 * max(fog_edge, 1), (true_edge, fog_edge)


def test_find_all_recovers_in_dense_fog_via_edge_ranking():
    """Driver wiring: the fog-density switch enables rank_edges_only and the
    instance is found sub-mm in a fog-dominated scene."""
    policy = SearchPolicy(scorer="pallas", pallas_interpret=True,
                          num_first_samples=64, max_rounds=2)
    (mx, mn, mt), scene, t_gt = _fog_scene(60000, seed=2, extent=1.2)
    model = compile_model(PointCloud.from_arrays(mx, mn, mt), DISC, SAMPLE, policy)
    matches = driver.find_all(
        model, scene, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=10, seed=5,
    )
    assert driver.LAST_SEARCH_STATS.get("fine_rescore_full") is True
    assert driver.LAST_SEARCH_STATS.get("rank_edges_only") is True
    # the fog switch also anchors the polish point-to-line (round 5):
    # edge corrs are nearest samples of the edge curves, so the GN fit
    # projects out the along-edge sampling axis
    assert driver.LAST_SEARCH_STATS.get("tight_point_to_line") is True
    assert matches, "instance lost in fog"
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 1.5e-3 and float(np.degrees(float(dr))) < 0.5

    # explicit opt-out keeps the pre-round-4 all-point ranking
    off = dataclasses.replace(policy, rank_edges_only=False,
                              tight_point_to_line=False)
    driver.find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                    sample_params=SAMPLE, discretization=DISC, policy=off,
                    max_icp_iterations=10, seed=5)
    assert driver.LAST_SEARCH_STATS.get("rank_edges_only") is False
    assert driver.LAST_SEARCH_STATS.get("tight_point_to_line") is False


def test_raw_tangent_gate_recovers_when_detection_starves():
    """policy.scene_raw_tangents: greedy acceptance needs score_t >=
    match_factor * model n_edge tangent-bearing corrs, but dense fog
    contaminates the curvature neighborhoods the detection gate inspects
    — at 100k fog / extent 0.9 only ~279/600 instance edges survive
    detection, UNDER the 300-corr threshold, so acceptance is
    structurally impossible on the detected mask (the 6M seed-2 envelope
    miss, evidence_r5/diag6m_s2_r5: rejection_rate 1.0).  The raw
    provided-tangent mask is density-independent (and a superset of the
    detected mask), so the fog switch swaps the scene's edge identity to
    it; an explicit opt-out must reproduce the starved miss."""
    policy = SearchPolicy(scorer="pallas", pallas_interpret=True,
                          num_first_samples=64, max_rounds=2)
    (mx, mn, mt), scene, t_gt = _fog_scene(100000, seed=4, extent=0.9)
    model = compile_model(PointCloud.from_arrays(mx, mn, mt), DISC, SAMPLE, policy)
    prep = driver.prepare_scene(scene, policy)
    n_det = int(prep.n_edge)
    min_pts = int(0.5 * 600)
    assert n_det < min_pts, n_det  # the starvation premise holds

    matches = driver.find_all(
        model, scene, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=policy,
        max_icp_iterations=10, seed=5, prep=prep,
    )
    assert driver.LAST_SEARCH_STATS.get("scene_raw_tangents") is True
    assert driver.LAST_SEARCH_STATS.get("scene_n_edge_raw") == 600
    assert matches, "instance lost despite the raw-tangent gate"
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 1.5e-3 and float(np.degrees(float(dr))) < 0.5

    # explicit opt-out: the detected mask cannot reach the acceptance
    # threshold, so the same scene yields no match
    off = dataclasses.replace(policy, scene_raw_tangents=False)
    matches_off = driver.find_all(
        model, scene, dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=off,
        max_icp_iterations=10, seed=5, prep=prep,
    )
    assert driver.LAST_SEARCH_STATS.get("scene_raw_tangents") is None
    assert not matches_off
