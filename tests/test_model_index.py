"""Tests for model compilation: voxel LUT + sorted pair table + queries."""

import numpy as np
import pytest
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.features import discretize as dz
from triplet_match_tpu.features import pairfeat as pf
from triplet_match_tpu.index.model import compile_model, query_pairs, voxel_query
from triplet_match_tpu.io.synthetic import make_box_model


PARAMS = DiscretizationParams()
SAMPLE = SampleParams(min_diameter_factor=0.2, max_diameter_factor=1.0)
POLICY = SearchPolicy()


@pytest.fixture(scope="module")
def box_model():
    xyz, normal, tangent = make_box_model(n_edge=180, n_face=420, size=(1, 1, 1), seed=0)
    cloud = PointCloud.from_arrays(xyz, normal, tangent)
    return compile_model(cloud, PARAMS, SAMPLE, POLICY, pair_block=128)


def _host_pair_table(model):
    """Rebuild the multimap on host exactly like impl/model.hpp:124-149."""
    xyz = np.asarray(model.cloud.xyz)
    tan = np.asarray(model.cloud.tangent)
    edge = np.asarray(model.edge)
    bmin = np.asarray(model.bounds_min)
    bmax = np.asarray(model.bounds_max)
    dia = float(model.diameter)
    lo, hi = dia * SAMPLE.min_diameter_factor, dia * SAMPLE.max_diameter_factor
    table = {}
    idxs = np.where(edge)[0]
    for i in idxs:
        for j in idxs:
            if i == j:
                continue
            d = xyz[j] - xyz[i]
            dist = np.linalg.norm(d)
            if dist < lo or dist > hi:
                continue
            if 1.0 - abs((d / dist) @ tan[i]) < 0.01:
                continue
            ang1 = np.arctan2(np.linalg.norm(np.cross(d, tan[i])), abs(d @ tan[i]))
            ang2 = np.arctan2(np.linalg.norm(np.cross(d, tan[j])), abs(d @ tan[j]))
            f = np.array([dist, ang1, ang2, dist], np.float32)
            if f[0] < bmin[0] or f[0] > bmax[0]:
                continue
            nval = (f[0] - bmin[0]) / (bmax[0] - bmin[0])
            d0 = 0 if nval < 0 else (PARAMS.distance_step_count - 1 if nval >= 1 else int(nval * PARAMS.distance_step_count))
            a1 = int(f[1] / PARAMS.angle_step)
            a2 = int(f[2] / PARAMS.angle_step)
            key = (d0 << 20) | (a1 << 10) | a2
            table.setdefault(key, []).append((i, j))
    return table


def test_voxel_lut_is_nearest_point(box_model):
    m = box_model
    xyz = np.asarray(m.cloud.xyz)
    lut = np.asarray(m.lut)
    inv = np.linalg.inv(np.asarray(m.to_voxel))
    ex, ey, ez = lut.shape
    rng = np.random.default_rng(0)
    for _ in range(50):
        i, j, k = rng.integers(0, ex), rng.integers(0, ey), rng.integers(0, ez)
        center = (inv @ np.array([i, j, k, 1.0], np.float32))[:3]
        d = np.linalg.norm(xyz - center, axis=1)
        best = d.min()
        got = d[lut[i, j, k]]
        assert got <= best + 1e-5


def test_voxel_query_matches_lut_and_bounds(box_model):
    m = box_model
    # a point inside the model maps in-bounds; a faraway point does not
    inside = m.cloud.xyz[0]
    idx, ok = voxel_query(m, inside[None, :])
    assert bool(ok[0])
    far = jnp.asarray([[100.0, 100.0, 100.0]])
    _, ok2 = voxel_query(m, far)
    assert not bool(ok2[0])
    # in-bounds index equals direct LUT read
    v = np.asarray(inside @ m.to_voxel[:3, :3].T + m.to_voxel[:3, 3])
    ijk = np.floor(v).astype(int)
    assert int(idx[0]) == int(np.asarray(m.lut)[tuple(ijk)])


def test_pair_table_matches_host_multimap(box_model):
    m = box_model
    table = _host_pair_table(m)
    want_count = sum(len(v) for v in table.values())
    assert int(m.pair_count) == want_count

    keys = np.asarray(m.keys)[: want_count]
    pairs = np.asarray(m.pairs)[: want_count]
    # sorted, and every (key -> pair set) matches the host multimap
    assert np.all(np.diff(keys.astype(np.int64)) >= 0)
    got = {}
    for k, (i, j) in zip(keys, pairs):
        got.setdefault(int(k), set()).add((int(i), int(j)))
    want = {k: set(v) for k, v in table.items()}
    assert got == want


def test_query_pairs_returns_bucket(box_model):
    m = box_model
    table = _host_pair_table(m)
    # pick the largest bucket and query with a feature that discretizes into it
    key = max(table, key=lambda k: len(table[k]))
    i, j = table[key][0]
    xyz, tan = m.cloud.xyz, m.cloud.tangent
    f = pf.pair_feature(xyz[i], xyz[j], tan[i], tan[j])
    cap = 64
    pairs, valid = query_pairs(m, f[None, :], PARAMS, cap)
    got = {(int(a), int(b)) for (a, b), ok in zip(np.asarray(pairs[0]), np.asarray(valid[0])) if ok}
    want = set(table[key])
    if len(want) <= cap:
        assert got == want
    else:
        assert got <= want and len(got) == cap


def test_query_missing_feature_is_empty(box_model):
    m = box_model
    # angle bins far outside anything the box produces
    f = jnp.asarray([float(m.bounds_max[0]) * 0.5, 1.55, 1.55, float(m.bounds_max[0]) * 0.5])
    pairs, valid = query_pairs(m, f[None, :], PARAMS, 16)
    assert int(valid.sum()) == 0


def test_serialize_roundtrip(tmp_path, box_model):
    from triplet_match_tpu.index.serialize import save_model, load_model

    p = str(tmp_path / "model.npz")
    save_model(p, box_model)
    m2 = load_model(p)
    assert m2.margin == box_model.margin
    np.testing.assert_array_equal(np.asarray(m2.lut), np.asarray(box_model.lut))
    np.testing.assert_array_equal(np.asarray(m2.keys), np.asarray(box_model.keys))
    np.testing.assert_allclose(np.asarray(m2.to_voxel), np.asarray(box_model.to_voxel))
    assert int(m2.pair_count) == int(box_model.pair_count)


def test_jfa_lut_matches_brute(box_model):
    """Jump-flood LUT (big-model path) vs exact brute 1-NN on the same grid.

    JFA is almost-exact; the assertion is distance-based: every voxel's
    chosen point must be (near-)as-close to the voxel center as the true
    nearest point — mismatched indices are fine only at genuine ties or
    with negligible excess distance.
    """
    import jax
    from triplet_match_tpu.ops.jfa import nearest_point_volume

    m = box_model
    lut_brute = np.asarray(m.lut)  # compile_model used the exact path here
    lut_jfa = np.asarray(
        nearest_point_volume(m.cloud.xyz, m.cloud.valid, m.to_voxel,
                             extents=m.lut.shape)
    )
    assert lut_jfa.shape == lut_brute.shape
    assert (lut_jfa >= 0).all()

    inv = np.linalg.inv(np.asarray(m.to_voxel))
    ex, ey, ez = lut_brute.shape
    ii, jj, kk = np.meshgrid(np.arange(ex), np.arange(ey), np.arange(ez),
                             indexing="ij")
    centers = np.stack([ii, jj, kk], -1).reshape(-1, 3).astype(np.float32)
    centers = centers @ inv[:3, :3].T + inv[:3, 3]
    xyz = np.asarray(m.cloud.xyz)
    d_true = np.linalg.norm(xyz[lut_brute.reshape(-1)] - centers, axis=1)
    d_jfa = np.linalg.norm(xyz[lut_jfa.reshape(-1)] - centers, axis=1)

    voxel = float(np.linalg.norm(np.diag(inv[:3, :3])))
    excess = d_jfa - d_true
    assert excess.min() > -1e-5  # cannot beat the true NN
    # the documented bound (ops/jfa.py): ~97% exact, the rest within half a
    # voxel diagonal of the true NN — inside the LUT's own quantization
    # class (queries sit up to half a voxel from the center they resolve at)
    assert np.mean(lut_jfa.reshape(-1) == lut_brute.reshape(-1)) > 0.95
    assert excess.max() < 0.5 * voxel


def test_voxel_grid_capped_for_dense_models():
    """A resolution-derived grid above the HBM budget shrinks isotropically
    (the reference's unbounded impl/model.hpp:41-65 sizing would build a
    multi-gigavoxel LUT for densely sampled models — ROADMAP edge-dense
    study)."""
    from triplet_match_tpu.index.model import _MAX_LUT_VOXELS, _voxel_grid_setup

    lower = np.zeros(3, np.float32)
    upper = np.ones(3, np.float32)
    # resolution 0.001 -> 2000 voxels/axis -> 8.1e9 total, far over budget
    extents, to_voxel = _voxel_grid_setup(lower, upper, 0.001, margin=5)
    assert float(np.prod(extents)) <= _MAX_LUT_VOXELS * 1.01
    # grid stays isotropic for a cubic bbox and the affine matches extents
    assert max(extents) - min(extents) <= 1
    for ax in range(3):
        assert abs(to_voxel[ax, ax] - (extents[ax] - 10)) < 2
    # small models are untouched by the cap
    e2, _ = _voxel_grid_setup(lower, upper, 0.02, margin=5)
    assert all(abs(int(e) - 110) <= 1 for e in e2)
