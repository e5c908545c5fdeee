"""Feature quantization + key packing + MurmurHash3 parity op.

Mirrors /root/reference/src/discretize.cpp and include/impl/discretize.hpp.

The reference hashes the 4-bin discrete feature with MurmurHash3_x86_32
(seed 42) into an ``unordered_multimap``.  On TPU the multimap becomes a
sorted dense table: the 4 bins are packed losslessly into one uint32 key
(bins are small: distance_step_count ~ 20, angle bins ~ ceil(pi / angle_step))
and queried by ``searchsorted``.  Murmur is still provided — bit-exact in
uint32 arithmetic — for cross-checking against the reference hash and for the
native host index.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Bit widths for packing (d0, a1, a2) -> uint32.  f3 duplicates f0
# (impl/feature.hpp:31) so it carries no extra information and is not packed.
_DIST_BITS = 12
_ANG_BITS = 10


def discretize_range(value, min_value, range_value, steps: int) -> jax.Array:
    """Range-normalized binning, clamped (src/discretize.cpp:19-25)."""
    nval = (value - min_value) / range_value
    bins = jnp.floor(nval * steps).astype(jnp.uint32)
    bins = jnp.where(nval < 0.0, jnp.uint32(0), bins)
    bins = jnp.where(nval >= 1.0, jnp.uint32(steps - 1), bins)
    return bins


def discretize_step(value, step_size: float) -> jax.Array:
    """Fixed-step binning (src/discretize.cpp:27-30)."""
    return (jnp.asarray(value) / step_size).astype(jnp.uint32)


def discretize_feature(f: jax.Array, bounds_min, bounds_max, params) -> jax.Array:
    """[..., 4] feature -> [..., 4] uint32 bins (impl/feature.hpp:36-46).

    Bin layout: [distance, angle1, angle2, distance] — the 4th repeats the
    1st exactly as upstream.
    """
    bmin = bounds_min[0]
    brange = bounds_max[0] - bounds_min[0]
    d0 = discretize_range(f[..., 0], bmin, brange, params.distance_step_count)
    a1 = discretize_step(f[..., 1], params.angle_step)
    a2 = discretize_step(f[..., 2], params.angle_step)
    return jnp.stack([d0, a1, a2, d0], axis=-1)


def pack_key(df: jax.Array) -> jax.Array:
    """Pack discrete feature bins [..., 4] into a single uint32 sort key.

    Lossless for distance_step_count < 2^12 and angle bins < 2^10.  Since the
    4th bin equals the 1st it is omitted.  Exact-key equality on the packed
    value is equivalent to the reference multimap's key equality (the
    multimap also compares full keys; murmur only buckets).
    """
    d0 = df[..., 0].astype(jnp.uint32)
    a1 = df[..., 1].astype(jnp.uint32)
    a2 = df[..., 2].astype(jnp.uint32)
    return (d0 << (2 * _ANG_BITS)) | (a1 << _ANG_BITS) | a2


def max_angle_bins(params) -> int:
    """Static upper bound on angle bins: angles lie in [0, pi/2]."""
    return int(math.floor((math.pi / 2) / params.angle_step)) + 1


# ---------------------------------------------------------------------------
# MurmurHash3_x86_32 (seed 42) — bit-exact port of impl/discretize.hpp:12-45.
# ---------------------------------------------------------------------------

_MURMUR_SEED = np.uint32(42)
_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl32(x: jax.Array, r: int) -> jax.Array:
    return (x << r) | (x >> (32 - r))


def murmur(key: jax.Array) -> jax.Array:
    """MurmurHash3_x86_32 over uint32 words along the last axis.

    key: [..., Dim] uint32.  Returns [...] uint32, matching
    ``triplet_match::detail::murmur`` exactly for any Dim.
    """
    key = key.astype(jnp.uint32)
    dim = key.shape[-1]
    h1 = jnp.full(key.shape[:-1], _MURMUR_SEED, jnp.uint32)
    for i in range(dim):
        k1 = key[..., i] * _C1
        k1 = _rotl32(k1, 15)
        k1 = k1 * _C2
        h1 = h1 ^ k1
        h1 = _rotl32(h1, 13)
        h1 = h1 * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    h1 = h1 ^ jnp.uint32(4 * dim)
    h1 = h1 ^ (h1 >> 16)
    h1 = h1 * jnp.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> 13)
    h1 = h1 * jnp.uint32(0xC2B2AE35)
    h1 = h1 ^ (h1 >> 16)
    return h1
