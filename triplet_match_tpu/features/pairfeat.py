"""Pair-feature descriptor (the reference's "triplet" feature).

Mirrors ``feature()`` (/root/reference/include/impl/feature.hpp:15-34):

  f0 = ||p1 - p0||
  f1 = angle(d, tangent0)   with angle(a,b) = atan2(||a x b||, |a . b|)
  f2 = angle(d, tangent1)
  f3 = f0                   (curvature-ratio slot commented out upstream,
                             impl/feature.hpp:31 — kept as a deliberate quirk
                             so discretized keys match bit-for-policy)

All ops are batched: inputs are arrays of pair endpoints, outputs are
[..., 4] feature arrays.  The unsigned angle lies in [0, pi/2].
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def unsigned_angle(a: jax.Array, b: jax.Array) -> jax.Array:
    """atan2(||a x b||, |a . b|) along the last axis (impl/feature.hpp:5-8)."""
    cross = jnp.cross(a, b)
    return jnp.arctan2(jnp.linalg.norm(cross, axis=-1), jnp.abs(jnp.sum(a * b, axis=-1)))


def pair_feature(p0, p1, t0, t1) -> jax.Array:
    """Batched pair feature [..., 4] from endpoint positions and tangents."""
    d = p1 - p0
    f0 = jnp.linalg.norm(d, axis=-1)
    f1 = unsigned_angle(d, t0)
    f2 = unsigned_angle(d, t1)
    return jnp.stack([f0, f1, f2, f0], axis=-1)


def feature_valid(f: jax.Array, bounds_min: jax.Array, bounds_max: jax.Array) -> jax.Array:
    """Validity vs model feature bounds (impl/feature.hpp:48-88).

    Distance (f0) must lie within [min0, max0]; angles must lie in [0, pi].
    """
    pi = jnp.float32(math.pi)
    dist_ok = (f[..., 0] >= bounds_min[0]) & (f[..., 0] <= bounds_max[0])
    ang_ok = (
        (f[..., 1] >= 0.0) & (f[..., 1] <= pi) & (f[..., 2] >= 0.0) & (f[..., 2] <= pi)
    )
    return dist_ok & ang_ok


def valid_bounds(bounds_min, bounds_max, min_rel_dist: float = 0.0, max_rel_dist: float = 1.0):
    """Rescale distance dims of the bounds to a relative sub-range.

    Mirrors ``valid_bounds`` (impl/feature.hpp:90-114).  With the live call's
    (0, 1) arguments this is the identity — implemented for API parity.
    """
    bmin = jnp.asarray(bounds_min, jnp.float32)
    bmax = jnp.asarray(bounds_max, jnp.float32)
    diag = bmax - bmin
    new_min = bmin.at[0].set(bmin[0] + min_rel_dist * diag[0]).at[3].set(bmin[3] + min_rel_dist * diag[3])
    new_max = bmax.at[0].set(bmin[0] + max_rel_dist * diag[0]).at[3].set(bmin[3] + max_rel_dist * diag[3])
    return new_min, new_max


def pair_gates(p0, p1, t0, lower: jax.Array, upper: jax.Array, parallel_eps: float = 0.01):
    """Distance-band + tangent-parallel rejection gates for candidate pairs.

    Mirrors the gates applied in both the model pair pass
    (impl/model.hpp:107-111) and the scene inner loop (impl/scene.hpp:293-297):
    reject if dist outside [lower, upper] or if the pair direction is nearly
    parallel to the first tangent (1 - |d.t0| < eps, d normalized).

    Note the reference compares the *normalized* direction against the raw
    stored tangent; edge tangents are ~unit so this matches.
    """
    d = p1 - p0
    dist = jnp.linalg.norm(d, axis=-1)
    safe = jnp.maximum(dist, 1e-30)
    dhat = d / safe[..., None]
    in_band = (dist >= lower) & (dist <= upper)
    not_parallel = (1.0 - jnp.abs(jnp.sum(dhat * t0, axis=-1))) >= parallel_eps
    return in_band & not_parallel
