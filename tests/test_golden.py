"""Golden regression tests: pinned concrete values for fixed-seed fixtures.

SURVEY §4 test strategy: golden tests catch silent numeric/policy drift that
property tests absorb.  If one of these fails after an intentional change,
re-pin the value and say why in the commit.
"""

import numpy as np
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.features.discretize import murmur, pack_key
from triplet_match_tpu.features.pairfeat import pair_feature
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import make_box_model


def test_golden_murmur_vectors():
    """Known-answer vectors for MurmurHash3_x86_32 seed 42 over uint32 words."""
    # cross-validated against an independent pure-python MurmurHash3
    # implementation (test_features.murmur3_x86_32_ref)
    cases = {
        (0,): 0x379FAE8F,
        (1, 2, 3, 4): 0x3F7F5D44,
        (0xDEADBEEF,): 0x086B46C3,
        (42, 42, 42, 42): 0x2960F117,
    }
    for words, want in cases.items():
        got = int(murmur(jnp.asarray([list(words)], jnp.uint32))[0])
        assert got == want, f"murmur{words} = {got:#x}, want {want:#x}"


def test_golden_feature_and_key():
    p0 = jnp.asarray([0.0, 0.0, 0.0])
    p1 = jnp.asarray([1.0, 1.0, 0.0])
    t0 = jnp.asarray([1.0, 0.0, 0.0])
    t1 = jnp.asarray([0.0, 0.0, 1.0])
    f = np.asarray(pair_feature(p0, p1, t0, t1))
    np.testing.assert_allclose(f, [np.sqrt(2), np.pi / 4, np.pi / 2, np.sqrt(2)], rtol=1e-6)
    params = DiscretizationParams()
    from triplet_match_tpu.features.discretize import discretize_feature

    df = discretize_feature(jnp.asarray(f), jnp.asarray([0.0] * 4), jnp.asarray([2.0] * 4), params)
    key = int(pack_key(df))
    # d0 = floor(sqrt(2)/2*20) = 14; a1 = floor((pi/4)/(pi/18)) = 4; a2 = 9
    assert key == (14 << 20) | (4 << 10) | 9


def test_golden_box_model_table():
    """Compiled-model fingerprint for the fixed box fixture."""
    xyz, nrm, tan = make_box_model(n_edge=96, n_face=192, size=(1, 1, 1), seed=0)
    m = compile_model(
        PointCloud.from_arrays(xyz, nrm, tan),
        DiscretizationParams(),
        SampleParams(min_diameter_factor=0.2, max_diameter_factor=1.0),
        SearchPolicy(),
        pair_block=128,
    )
    pc = int(m.pair_count)
    keys = np.asarray(m.keys)[:pc].astype(np.uint64)
    fingerprint = int(keys.sum() % (1 << 31))
    assert m.extents == (41, 41, 41)
    assert int(m.n_edge) == 13
    assert pc == 134
    assert fingerprint == 1512838917, fingerprint


def test_golden_pose_recovery_transform():
    """find_all on the fixed fixture returns a pinned transform (4 decimals)."""
    from triplet_match_tpu.search.driver import find_all
    from triplet_match_tpu.io.synthetic import embed_in_scene

    policy = SearchPolicy(
        num_first_samples=32, num_second_samples=8, query_cap=8,
        score_neighbors=128, finalists=2, max_rounds=2,
    )
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=360, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DiscretizationParams(), sample, policy)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.0, n_clutter=100, seed=2)
    matches = find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                       sample_params=sample, policy=policy, max_icp_iterations=5, seed=13)
    assert matches
    # noise-free fixture: recovered transform equals ground truth to 1e-3
    np.testing.assert_allclose(matches[0].transform, np.asarray(t_gt), atol=1e-3)
