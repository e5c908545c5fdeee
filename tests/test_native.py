"""Native host runtime parity tests (skipped when no C++ toolchain)."""

import numpy as np
import pytest
import jax.numpy as jnp

from triplet_match_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.build_error()}"
)


def test_murmur_matches_jnp():
    from triplet_match_tpu.features.discretize import murmur

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, size=(64, 4), dtype=np.uint32)
    got = native.murmur32(keys)
    want = np.asarray(murmur(jnp.asarray(keys)))
    np.testing.assert_array_equal(got, want)


def test_extract_fields_matches_numpy():
    rng = np.random.default_rng(1)
    n, stride = 100, 32
    raw = rng.integers(0, 255, n * stride, dtype=np.uint8)
    vals = rng.normal(size=(n, 3)).astype(np.float32)
    rec = raw.reshape(n, stride).copy()
    rec[:, 4:8] = vals[:, 0:1].view(np.uint8).reshape(n, 4)
    rec[:, 12:16] = vals[:, 1:2].view(np.uint8).reshape(n, 4)
    rec[:, 20:24] = vals[:, 2:3].view(np.uint8).reshape(n, 4)
    out = native.extract_fields(rec.tobytes(), n, stride, [4, 12, 20])
    np.testing.assert_array_equal(out, vals)


def test_knn_matches_jax_op():
    from triplet_match_tpu.ops.knn import knn as jknn

    rng = np.random.default_rng(2)
    r = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(50, 3)).astype(np.float32)
    valid = np.ones(300, bool)
    valid[10:20] = False
    nidx, nd2 = native.knn(q, r, 6, valid)
    jidx, jd2 = jknn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid), 6, block=32)
    np.testing.assert_allclose(nd2, np.asarray(jd2), rtol=1e-5, atol=1e-6)
    for a, b in zip(nidx, np.asarray(jidx)):
        assert set(a) == set(b)


def test_pair_pass_matches_model_compile():
    """The native O(n^2) pair pass reproduces the jitted table exactly."""
    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import make_box_model

    params = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.2, max_diameter_factor=1.0)
    xyz, nrm, tan = make_box_model(n_edge=120, n_face=240, size=(1, 1, 1), seed=0)
    cloud = PointCloud.from_arrays(xyz, nrm, tan)
    m = compile_model(cloud, params, sample, SearchPolicy(), pair_block=128)

    edge = np.asarray(m.edge)
    dia = float(m.diameter)
    lower, upper = dia * 0.2, dia * 1.0
    bmin, bmax, cnt = native.pair_bounds(xyz, tan, edge, lower, upper)
    np.testing.assert_allclose(bmin, float(m.bounds_min[0]), rtol=1e-6)
    np.testing.assert_allclose(bmax, float(m.bounds_max[0]), rtol=1e-6)

    keys = native.pair_keys(
        xyz, tan, edge, lower, upper, bmin, bmax - bmin,
        params.distance_step_count, params.angle_step,
    )
    valid = keys != 0xFFFFFFFF
    assert int(valid.sum()) == int(m.pair_count)
    got = np.sort(keys[valid])
    want = np.asarray(m.keys)[: int(m.pair_count)]
    np.testing.assert_array_equal(got, want)


def test_grid_knn_matches_brute():
    from triplet_match_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    r = rng.normal(size=(5000, 3)).astype(np.float32)
    q = r[:512]
    k = 8
    bi, bd2 = native.knn(q, r, k)
    # cell sized at the brute kth-distance p90: one-ring covers ~90%+
    cell = float(np.quantile(np.sqrt(bd2[:, -1]), 0.95))
    gi, gd2 = native.grid_knn(q, r, k, cell)
    # grid can only miss neighbors, never beat brute
    assert (np.sort(gd2, 1) >= np.sort(bd2, 1) - 1e-6).all()
    exact = np.abs(gd2[:, -1] - bd2[:, -1]) < 1e-6
    assert exact.mean() >= 0.9


def test_grid_knn_respects_validity():
    from triplet_match_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(4)
    r = rng.normal(size=(2000, 3)).astype(np.float32)
    valid = (np.arange(2000) % 4 != 0)
    gi, gd2 = native.grid_knn(r[:100], r, 4, 0.5, valid=valid)
    ok = gd2 < 1e30
    assert valid[gi[ok]].all()
