"""PCD IO: ascii / binary / binary_compressed (LZF) round trips.

The reference loads scans through PCL (impl/pointcloud.hpp:58-64), which
reads LZF binary_compressed files — real scan data frequently ships that
way.
"""

import numpy as np
import pytest

from triplet_match_tpu.io.pcd import (
    _lzf_compress,
    _lzf_decompress,
    _lzf_decompress_py,
    read_pcd,
    write_pcd,
)


def _cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    tan = rng.normal(size=(n, 3)).astype(np.float32)
    return xyz, nrm, tan


def test_lzf_roundtrip_random_and_repetitive():
    rng = np.random.default_rng(1)
    for data in [
        rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes(),  # incompressible
        (b"abcd" * 4096),  # highly repetitive (back-references)
        bytes(100_000),  # all zeros (max-length references)
        rng.integers(0, 4, 50_000, dtype=np.uint8).tobytes(),  # mixed
        b"x",  # tiny
        b"",  # empty
    ]:
        comp = _lzf_compress(data)
        out = _lzf_decompress(comp, len(data)).tobytes()
        assert out == data
        # the pure-Python decoder agrees with the native one
        out_py = _lzf_decompress_py(comp, len(data)).tobytes()
        assert out_py == data


def test_lzf_compresses_repetitive_data():
    from triplet_match_tpu import native

    if not native.available():
        pytest.skip("native lzf not built")
    data = b"abcd" * 4096
    assert len(_lzf_compress(data)) < len(data) // 4


def test_binary_compressed_matches_uncompressed(tmp_path):
    xyz, nrm, tan = _cloud()
    p_bin = str(tmp_path / "c.pcd")
    p_cmp = str(tmp_path / "c_lzf.pcd")
    write_pcd(p_bin, xyz, nrm, tan)
    write_pcd(p_cmp, xyz, nrm, tan, compressed=True)

    a = read_pcd(p_bin)
    b = read_pcd(p_cmp)
    np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(b.xyz))
    np.testing.assert_array_equal(np.asarray(a.normal), np.asarray(b.normal))
    np.testing.assert_array_equal(np.asarray(a.tangent), np.asarray(b.tangent))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_ascii_matches_binary(tmp_path):
    xyz, nrm, tan = _cloud(100, seed=2)
    p_bin = str(tmp_path / "a.pcd")
    p_asc = str(tmp_path / "a_ascii.pcd")
    write_pcd(p_bin, xyz, nrm, tan)
    write_pcd(p_asc, xyz, nrm, tan, binary=False)
    a = read_pcd(p_bin)
    b = read_pcd(p_asc)
    np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz), rtol=1e-6)
