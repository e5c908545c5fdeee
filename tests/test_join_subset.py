"""Candidate-subset finalist join (policy.join_subset_capacity).

The join's scene-sized passes (prescreen / relaxed ICP / tight polish /
claim) dominate dense-scale search seconds (2M steady measured 52 s of
full-scene LUT-gather passes, RESULTS_r4 r4_hw_scaling_t).  A scene point
can correspond to a posed model only if its transformed position lands
inside the voxel grid — every scoring surface gates on ``voxel_query``'s
in_bounds (impl/model.hpp:180-192 nullopt branch) — so gathering the
in-grid(+slack) candidates per finalist and running the unchanged
finish_find/ICP machinery on the sub-scene is exact by construction; these
tests pin that contract.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.core.transforms import invert_rigid, pose_delta
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import fog_patches, make_box_model, rotation_matrix
from triplet_match_tpu.search import driver
from triplet_match_tpu.search.score import finish_find

DISC = DiscretizationParams()
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)


def _fog_scene(n_fog, seed):
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    rngc = np.random.default_rng(3000 + seed)
    r_inst = rotation_matrix(rngc.normal(size=3), rngc.uniform(0, np.pi))
    t_off = rngc.uniform(-0.3, 0.3, 3).astype(np.float32)
    c_xyz, c_nrm = fog_patches(rngc, n_fog, seed_base=7200 + 100 * seed, extent=0.8)
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


def test_candidate_subset_is_exact_eligibility_superset():
    """finish_find over the gathered candidate sub-scene must reproduce the
    full-scene counts, per-point validity, and model indices exactly (the
    in_bounds superset argument), and report the true candidate population."""
    policy = SearchPolicy()
    (mx, mn, mt), scene, t_gt = _fog_scene(20000, seed=2)
    model = compile_model(PointCloud.from_arrays(mx, mn, mt), DISC, SAMPLE, policy)
    prep = driver.prepare_scene(scene, policy)
    n = scene.xyz.shape[0]
    consumed = jnp.zeros(n, bool)
    t_true = jnp.asarray(invert_rigid(jnp.asarray(t_gt)))

    full = finish_find(model, prep.cloud, prep.tangent_mask, consumed, t_true, 3.0)
    sub, stm, scons, idx, ividx, n_cand = driver._candidate_subset(
        model, prep.cloud, prep.tangent_mask, consumed, t_true[None], 3.0,
        16384, 4.0)
    assert int(n_cand[0]) <= 16384  # capacity precondition for exactness
    subf = finish_find(model, jax.tree_util.tree_map(lambda a: a[0], sub),
                       stm[0], scons[0], t_true, 3.0)
    assert int(subf.count) == int(full.count)

    cv, cm = driver._scatter_corrs(idx, ividx, subf.valid[None],
                                   subf.model_idx[None], n)
    np.testing.assert_array_equal(np.asarray(cv[0]), np.asarray(full.valid))
    np.testing.assert_array_equal(
        np.asarray(cm[0])[np.asarray(full.valid)],
        np.asarray(full.model_idx)[np.asarray(full.valid)])


def test_join_overflow_is_reported():
    """Capacity below the candidate population must surface as a positive
    join_overflow (the undercount observability contract)."""
    policy = SearchPolicy(finalist_prescreen=0, join_subset_capacity=1024,
                          tight_icp_iterations=1)
    (mx, mn, mt), scene, t_gt = _fog_scene(20000, seed=2)
    model = compile_model(PointCloud.from_arrays(mx, mn, mt), DISC, SAMPLE, policy)
    prep = driver.prepare_scene(scene, policy)
    n = scene.xyz.shape[0]
    t_true = jnp.asarray(invert_rigid(jnp.asarray(t_gt)))
    out = driver.accept_and_polish(
        model, prep.cloud, prep.tangent_mask, jnp.zeros(n, bool),
        jnp.stack([t_true, jnp.eye(4)]), 3.0, 0.5,
        policy=policy, max_icp_iterations=2)
    assert int(out[-1]) > 0  # ~14.5k candidates vs 1024 capacity


def test_find_all_join_subset_matches_full_join():
    """E2E A/B in the fog-switch regime: the subset join must accept the
    same matches at the same poses (float tolerance: reduced-width Kabsch
    sums round differently) with zero overflow."""
    base = SearchPolicy(scorer="pallas", pallas_interpret=True,
                        num_first_samples=48, max_rounds=1,
                        fine_full_rescore_ratio=2.0)
    (mx, mn, mt), scene, t_gt = _fog_scene(15000, seed=2)
    model = compile_model(PointCloud.from_arrays(mx, mn, mt), DISC, SAMPLE, base)

    results = {}
    for capv in (0, 16384):
        pol = dataclasses.replace(base, join_subset_capacity=capv)
        m = driver.find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                            sample_params=SAMPLE, discretization=DISC, policy=pol,
                            max_icp_iterations=10, seed=5)
        st = dict(driver.LAST_SEARCH_STATS)
        assert st.get("fine_rescore_full") is True  # switch fired
        assert st.get("join_overflow_max", 0) == 0
        results[capv] = m

    full, subset = results[0], results[16384]
    assert len(full) == len(subset) == 1
    dt, dr = pose_delta(jnp.asarray(subset[0].transform),
                        jnp.asarray(full[0].transform))
    assert float(dt) < 1e-4 and float(np.degrees(float(dr))) < 0.1
    # both sub-mm vs ground truth
    for m in (full[0], subset[0]):
        dt, dr = pose_delta(jnp.asarray(m.transform), jnp.asarray(t_gt))
        assert float(dt) < 1e-3 and float(np.degrees(float(dr))) < 0.5
