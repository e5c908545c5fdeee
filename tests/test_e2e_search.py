"""End-to-end pose recovery: the minimum acceptance slice (BASELINE config 3
analog at test scale — rigid model in a cluttered scene, fixed seed).

Generates scene = R * model + t + noise + clutter and asserts find_all
recovers the pose within the north-star tolerance (<1mm / <0.5 deg at unit
scale: the synthetic box is ~1m across, so 1e-3 translation units).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.core.transforms import pose_delta
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
from triplet_match_tpu.search.driver import find_all, instantiate, prepare_scene


POLICY = SearchPolicy(
    num_first_samples=48,
    num_second_samples=16,
    query_cap=8,
    score_neighbors=256,
    finalists=4,
    max_rounds=3,
)
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
DISC = DiscretizationParams()


@pytest.fixture(scope="module")
def setup():
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    model_cloud = PointCloud.from_arrays(xyz, nrm, tan)
    model = compile_model(model_cloud, DISC, SAMPLE, POLICY, pair_block=128)
    scene, t_gt, inst = embed_in_scene(
        xyz, nrm, tan, noise=0.001, n_clutter=400, clutter_extent=5.0, seed=11
    )
    return model, scene, t_gt, inst


def test_pose_recovery(setup):
    model, scene, t_gt, inst = setup
    matches = find_all(
        model, scene,
        dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=POLICY,
        max_icp_iterations=10, seed=13,
    )
    assert matches, "no match found"
    m = matches[0]
    dt, dr = pose_delta(jnp.asarray(m.transform), jnp.asarray(t_gt))
    dt, dr = float(dt), float(np.degrees(float(dr)))
    # 1mm-noise cluttered scene: the relaxed ICP threshold (2*dist_thres*res,
    # reference semantics impl/scene.hpp:373) admits nearby clutter corrs, so
    # a few mm of bias vs ground truth is the algorithm's own accuracy here.
    assert dt < 6e-3, f"translation delta {dt}"
    assert dr < 0.5, f"rotation delta {dr} deg"
    # correspondences must land on the true instance points
    assert np.mean(inst[m.scene_corrs]) > 0.95
    # instantiate places the model onto the instance
    placed = instantiate(model, m)
    sc = np.asarray(scene.xyz)[inst[: np.asarray(scene.xyz).shape[0]]]
    # mean nearest distance from placed points to true instance points is tiny
    d = np.linalg.norm(placed[:, None, :] - sc[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 0.01


def test_pose_precision_clean_scene(setup):
    """North-star precision check: noise-free, clutter-free scene must
    recover the pose to <1mm / <0.5 deg (BASELINE.json target)."""
    model, _, _, _ = setup
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.0, n_clutter=0, seed=29)
    matches = find_all(
        model, scene,
        dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=POLICY,
        max_icp_iterations=10, seed=13,
    )
    assert matches
    dt, dr = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 1e-3, f"translation delta {float(dt)}"
    assert float(np.degrees(float(dr))) < 0.5


def test_determinism(setup):
    model, scene, t_gt, _ = setup
    kwargs = dict(
        dist_thres=3.0, model_match_factor=0.5, sample_params=SAMPLE,
        discretization=DISC, policy=POLICY, max_icp_iterations=5, seed=21,
    )
    m1 = find_all(model, scene, **kwargs)
    m2 = find_all(model, scene, **kwargs)
    assert len(m1) == len(m2)
    for a, b in zip(m1, m2):
        np.testing.assert_array_equal(a.transform, b.transform)
        np.testing.assert_array_equal(a.scene_corrs, b.scene_corrs)


def test_no_match_in_pure_clutter(setup):
    model, _, _, _ = setup
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-2, 2, (600, 3)).astype(np.float32)
    nrm = rng.normal(size=(600, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    clutter = PointCloud.from_arrays(xyz, nrm)
    matches = find_all(
        model, clutter,
        dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=POLICY,
        max_icp_iterations=5, seed=1,
    )
    assert matches == []


def test_force_up_gate(setup):
    """force_up (sample_parameters, common:81) rejects poses that tilt the
    up axis (|1 - R[2,2]| > 0.01, impl/scene.hpp:317-319)."""
    model, _, _, _ = setup
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    from triplet_match_tpu.io.synthetic import rotation_matrix

    # instance tilted 90 degrees about x: up is NOT preserved
    r = rotation_matrix([1, 0, 0], np.pi / 2)
    scene, t_gt, _ = embed_in_scene(
        xyz, nrm, tan, rotation=r, translation=np.zeros(3, np.float32),
        noise=0.001, n_clutter=200, seed=3,
    )
    kwargs = dict(dist_thres=3.0, model_match_factor=0.5, discretization=DISC,
                  policy=POLICY, max_icp_iterations=5, seed=13)
    up_sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95, force_up=True)
    no_up = find_all(model, scene, sample_params=up_sample, **kwargs)
    assert no_up == []  # tilted instance rejected by the up gate
    free = find_all(model, scene, sample_params=SAMPLE, **kwargs)
    assert free  # without the gate the same scene matches


def test_two_instances(setup):
    model, _, _, _ = setup
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    from triplet_match_tpu.io.synthetic import rotation_matrix

    r1 = rotation_matrix([0, 0, 1], 0.4)
    r2 = rotation_matrix([1, 1, 0], 2.0)
    t1, t2 = np.array([3, 0, 0], np.float32), np.array([-3, 0, 0], np.float32)
    x1 = xyz @ r1.T + t1
    x2 = xyz @ r2.T + t2
    scene = PointCloud.from_arrays(
        np.concatenate([x1, x2]),
        np.concatenate([nrm @ r1.T, nrm @ r2.T]),
        np.concatenate([tan @ r1.T, tan @ r2.T]),
    )
    matches = find_all(
        model, scene,
        dist_thres=3.0, model_match_factor=0.5,
        sample_params=SAMPLE, discretization=DISC, policy=POLICY,
        max_icp_iterations=10, seed=5,
    )
    assert len(matches) == 2
    gts = [(r1, t1), (r2, t2)]
    found = set()
    for m in matches:
        for gi, (r, t) in enumerate(gts):
            tg = np.eye(4, dtype=np.float32)
            tg[:3, :3] = r
            tg[:3, 3] = t
            dt, dr = pose_delta(jnp.asarray(m.transform), jnp.asarray(tg))
            if float(dt) < 5e-3 and float(np.degrees(float(dr))) < 1.0:
                found.add(gi)
    assert found == {0, 1}


def test_finalist_chunked_map_equivalent(setup, monkeypatch):
    """The HBM-budget finalist chunking (driver._finalist_map) must be a
    pure regrouping: forcing the fully sequential path (budget below one
    scene's rows) yields the same matches as the vmapped default — same
    match set and correspondences, poses equal to float tolerance (batched
    and unbatched linalg kernels round differently in the Kabsch SVD).
    Guards the 4M OOM fix — the vmapped finalist ICP/finish_find fuses an
    [F*N, 3] buffer whose TPU lane padding (3 -> 128) reaches 34 GB at the
    16-finalist funnel on 4M points (evidence_r4/scaling_fin.log)."""
    from triplet_match_tpu.search import driver as drv

    model, scene, _, _ = setup
    kwargs = dict(
        dist_thres=3.0, model_match_factor=0.5, sample_params=SAMPLE,
        discretization=DISC, policy=POLICY, max_icp_iterations=5, seed=21,
    )
    drv.clear_round_cache()
    ref = find_all(model, scene, **kwargs)
    monkeypatch.setattr(drv, "_FINALIST_ROW_BUDGET", 1)  # forces batch_size=1
    drv.clear_round_cache()
    chunked = find_all(model, scene, **kwargs)
    drv.clear_round_cache()
    assert len(ref) == len(chunked) and len(ref) >= 1
    for a, b in zip(ref, chunked):
        np.testing.assert_allclose(a.transform, b.transform, atol=1e-5)
        np.testing.assert_array_equal(a.scene_corrs, b.scene_corrs)


def test_finalist_map_remainder_batches(monkeypatch):
    """_finalist_map with F not divisible by the fitting batch (F=5, fc=2):
    lax.map's remainder handling must reproduce the vmap result exactly for
    a linalg-free function."""
    import jax
    from triplet_match_tpu.search import driver as drv

    f = lambda t: (t @ t).sum(axis=-1)
    ts = jnp.arange(5 * 16, dtype=jnp.float32).reshape(5, 4, 4)
    ref = jax.vmap(f)(ts)
    monkeypatch.setattr(drv, "_FINALIST_ROW_BUDGET", 20)  # fc = 20//10 = 2
    out = drv._finalist_map(f, ts, 10)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_finalist_prescreen_preserves_matches(setup):
    """The exact-count prescreen (policy.finalist_prescreen) must not change
    WHAT is found when the true pose is in the funnel: it ranks the widened
    finalist set by one full-scene relaxed count each (the acceptance
    statistic itself) and forwards only the top ``keep`` to the relaxed-ICP
    join, so the accepted match and its pose are identical to the
    unprescreened join.  This is the 4M envelope-edge cost bound: the
    density switch widens the funnel to 16, and 16 full ICP joins exceed
    the single-program runtime horizon at 4M points
    (evidence_r4/scaling_r.log execution fault)."""
    import dataclasses

    from triplet_match_tpu.search import driver as drv

    model, scene, _, _ = setup
    kwargs = dict(
        dist_thres=3.0, model_match_factor=0.5, sample_params=SAMPLE,
        discretization=DISC, max_icp_iterations=5, seed=21,
    )
    wide = dataclasses.replace(POLICY, finalists=8)
    drv.clear_round_cache()
    ref = find_all(model, scene, policy=wide, **kwargs)
    pre = dataclasses.replace(wide, finalist_prescreen=2)
    drv.clear_round_cache()
    cut = find_all(model, scene, policy=pre, **kwargs)
    drv.clear_round_cache()
    assert len(ref) == len(cut) and len(ref) >= 1
    for a, b in zip(ref, cut):
        np.testing.assert_allclose(a.transform, b.transform, atol=1e-5)
        np.testing.assert_array_equal(a.scene_corrs, b.scene_corrs)
