"""Unit tests for the pair feature, discretization, and murmur parity."""

import math

import numpy as np
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams
from triplet_match_tpu.features import pairfeat as pf
from triplet_match_tpu.features import discretize as dz


def murmur3_x86_32_ref(words, seed=42):
    """Pure-python MurmurHash3_x86_32 over uint32 words (the reference's
    impl/discretize.hpp:12-45 semantics, independent implementation)."""
    mask = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & mask

    h1 = seed
    for w in words:
        k1 = (int(w) * 0xCC9E2D51) & mask
        k1 = rotl(k1, 15)
        k1 = (k1 * 0x1B873593) & mask
        h1 ^= k1
        h1 = rotl(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & mask
    h1 ^= 4 * len(words)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & mask
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & mask
    h1 ^= h1 >> 16
    return h1


def test_murmur_bit_exact():
    rng = np.random.default_rng(0)
    for dim in (1, 2, 4, 9):
        keys = rng.integers(0, 2**32, size=(16, dim), dtype=np.uint32)
        got = np.asarray(dz.murmur(jnp.asarray(keys)))
        want = np.array([murmur3_x86_32_ref(k) for k in keys], np.uint32)
        np.testing.assert_array_equal(got, want)


def test_unsigned_angle_values():
    a = jnp.asarray(np.array([[1, 0, 0]], np.float32))
    cases = {
        (0.0, 1.0, 0.0): math.pi / 2,
        (1.0, 0.0, 0.0): 0.0,
        (-1.0, 0.0, 0.0): 0.0,  # |dot| folds opposite directions
        (1.0, 1.0, 0.0): math.pi / 4,
    }
    for b, want in cases.items():
        got = float(pf.unsigned_angle(a, jnp.asarray(np.array([b], np.float32)))[0])
        assert abs(got - want) < 1e-6


def test_pair_feature_fields():
    p0 = jnp.asarray(np.array([[0, 0, 0]], np.float32))
    p1 = jnp.asarray(np.array([[2, 0, 0]], np.float32))
    t0 = jnp.asarray(np.array([[0, 1, 0]], np.float32))
    t1 = jnp.asarray(np.array([[1, 1, 0]], np.float32)) / np.sqrt(2)
    f = np.asarray(pf.pair_feature(p0, p1, t0, t1)[0])
    assert f[0] == 2.0 and f[3] == 2.0  # f3 duplicates f0 (impl/feature.hpp:31)
    assert abs(f[1] - math.pi / 2) < 1e-6
    assert abs(f[2] - math.pi / 4) < 1e-6


def test_discretize_range_clamps():
    params = DiscretizationParams(distance_step_count=10)
    vals = jnp.asarray(np.array([-0.5, 0.0, 0.55, 0.999, 1.0, 2.0], np.float32))
    bins = np.asarray(dz.discretize_range(vals, 0.0, 1.0, 10))
    np.testing.assert_array_equal(bins, [0, 0, 5, 9, 9, 9])


def test_discretize_feature_and_pack_roundtrip():
    params = DiscretizationParams()
    f = jnp.asarray(np.array([[0.5, 0.3, 1.2, 0.5]], np.float32))
    df = dz.discretize_feature(f, jnp.asarray([0.0, 0, 0, 0.0]), jnp.asarray([1.0, 0, 0, 1.0]), params)
    df = np.asarray(df)
    assert df[0, 0] == df[0, 3] == 10
    assert df[0, 1] == int(0.3 / params.angle_step)
    assert df[0, 2] == int(1.2 / params.angle_step)
    # pack is injective over the bin domain
    key = np.asarray(dz.pack_key(jnp.asarray(df)))
    d0, a1, a2 = df[0, 0], df[0, 1], df[0, 2]
    assert key[0] == (d0 << 20) | (a1 << 10) | a2


def test_pair_gates():
    p0 = jnp.zeros((3, 3), jnp.float32)
    p1 = jnp.asarray(np.array([[1, 0, 0], [0.01, 0, 0], [0, 1, 0]], np.float32))
    t0 = jnp.asarray(np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32))
    ok = np.asarray(pf.pair_gates(p0, p1, t0, lower=0.1, upper=2.0))
    # pair 0: parallel to its tangent -> reject; pair 1: too close -> reject; pair 2: ok
    np.testing.assert_array_equal(ok, [False, False, True])


def test_valid_bounds_identity_for_live_args():
    bmin, bmax = dz.jnp.asarray([0.1, 0, 0, 0.1]), dz.jnp.asarray([2.0, 0, 0, 2.0])
    nmin, nmax = pf.valid_bounds(bmin, bmax, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(nmin), np.asarray(bmin), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nmax), np.asarray(bmax), rtol=1e-6)
