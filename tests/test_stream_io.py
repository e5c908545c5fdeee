"""Streaming PCD ingestion (ROADMAP 11)."""

import numpy as np

from triplet_match_tpu.io.pcd import read_pcd, write_pcd
from triplet_match_tpu.io.stream import iter_pcd_chunks, read_pcd_streaming


def _cloud(n=2500, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    tan = rng.normal(size=(n, 3)).astype(np.float32)
    return xyz, nrm, tan


def test_streaming_matches_oneshot_binary(tmp_path):
    xyz, nrm, tan = _cloud()
    p = str(tmp_path / "s.pcd")
    write_pcd(p, xyz, nrm, tan)
    a = read_pcd(p)
    b = read_pcd_streaming(p, chunk_points=700)  # non-divisor chunk size
    np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(b.xyz))
    np.testing.assert_array_equal(np.asarray(a.normal), np.asarray(b.normal))
    np.testing.assert_array_equal(np.asarray(a.tangent), np.asarray(b.tangent))


def test_chunk_iterator_covers_all_points(tmp_path):
    xyz, nrm, tan = _cloud(1001, seed=1)
    p = str(tmp_path / "c.pcd")
    write_pcd(p, xyz, nrm, tan)
    chunks = list(iter_pcd_chunks(p, chunk_points=250))
    assert [c[0].shape[0] for c in chunks] == [250, 250, 250, 250, 1]
    np.testing.assert_array_equal(np.concatenate([c[0] for c in chunks]), xyz)


def test_streaming_ascii_and_compressed(tmp_path):
    xyz, nrm, tan = _cloud(300, seed=2)
    for kw, name in [({"binary": False}, "a.pcd"), ({"compressed": True}, "z.pcd")]:
        p = str(tmp_path / name)
        write_pcd(p, xyz, nrm, tan, **kw)
        b = read_pcd_streaming(p, chunk_points=128)
        np.testing.assert_allclose(np.asarray(b.xyz), xyz, rtol=1e-6)


def test_streaming_compressed_preserves_mid_array_nan(tmp_path):
    """The compressed path must chunk RAW rows: slicing the sanitized
    cloud's valid prefix fabricated a zero point and dropped the trailing
    valid one when a NaN row sat mid-array (review round 3)."""
    xyz, nrm, tan = _cloud(10, seed=3)
    xyz = xyz.copy()
    xyz[4] = np.nan
    p = str(tmp_path / "n.pcd")
    write_pcd(p, xyz, nrm, tan, compressed=True)
    rows = np.concatenate([c[0] for c in iter_pcd_chunks(p, chunk_points=4)])
    assert rows.shape[0] == 10
    assert np.isnan(rows[4]).all()
    np.testing.assert_allclose(rows[9], xyz[9], rtol=1e-6)
    cl = read_pcd_streaming(p, chunk_points=4)
    v = np.asarray(cl.valid)
    assert v.sum() == 9 and not v[4]
    np.testing.assert_allclose(np.asarray(cl.xyz)[9], xyz[9], rtol=1e-6)
