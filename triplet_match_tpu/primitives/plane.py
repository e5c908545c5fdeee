"""Plane projectors (``plane_traits`` and ``plane2_traits``).

Mirrors /root/reference/include/impl/plane_traits.hpp and
impl/plane2_traits.hpp.  State: a g2l/l2g frame pair + origin + height
threshold.  ``plane`` projects with height rejection (|w| > threshold ->
invalid) and 3-D intrinsic distance; ``plane2`` projects without rejection,
builds hypotheses from 3 points with normal-consistency gating, and uses
2-D intrinsic distance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from triplet_match_tpu.core.transforms import invert_rigid
from triplet_match_tpu.primitives.base import apply_h, frame_to_g2l, rotate, unit_orthogonal


class PlaneState(NamedTuple):
    g2l: jax.Array  # [..., 4, 4]
    l2g: jax.Array  # [..., 4, 4]
    origin: jax.Array  # [..., 3]
    threshold: jax.Array  # [...]


def fit_from_cloud(cloud, mask=None) -> PlaneState:
    """SVD plane fit (impl/plane_traits.hpp:4-42).

    Centroid + right singular vectors of the centered scatter; rows of g2l
    are V^T (3rd row = normal); threshold = 2 * max |height|.
    """
    if mask is None:
        mask = cloud.valid
    w = mask.astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1.0)
    centroid = (cloud.xyz * w[:, None]).sum(0) / wsum
    d = (cloud.xyz - centroid) * w[:, None]
    cov = d.T @ d
    _, vecs = jnp.linalg.eigh(cov)  # ascending: vecs[:,0] = normal direction
    ez = vecs[:, 0]
    ey = vecs[:, 1]
    ex = vecs[:, 2]
    g2l = frame_to_g2l(centroid, ex, ey, ez)
    heights = jnp.abs(apply_h(g2l, cloud.xyz)[..., 2]) * w
    threshold = 2.0 * heights.max()
    return PlaneState(g2l, invert_rigid(g2l), centroid, threshold)


def fit_from_samples(ref_state: PlaneState, p: jax.Array, n: jax.Array) -> tuple[PlaneState, jax.Array]:
    """1-sample hypothesis from point+normal (impl/plane_traits.hpp:44-62)."""
    ez = n
    ey = unit_orthogonal(n)
    ex = jnp.cross(ey, ez)
    ex = ex / jnp.maximum(jnp.linalg.norm(ex, axis=-1, keepdims=True), 1e-12)
    g2l = frame_to_g2l(p, ex, ey, ez)
    state = PlaneState(g2l, invert_rigid(g2l), p, jnp.broadcast_to(ref_state.threshold, p.shape[:-1]))
    return state, jnp.ones(p.shape[:-1], bool)


def project(state: PlaneState, xyz: jax.Array, *, reject_height: bool = True):
    """(uvw, valid).  plane_traits rejects |w| > threshold
    (impl/plane_traits.hpp:64-72); plane2 does not (impl/plane2_traits.hpp:84-88)."""
    uvw = apply_h(state.g2l, xyz)
    if reject_height:
        valid = jnp.abs(uvw[..., 2]) <= state.threshold
    else:
        valid = jnp.ones(uvw.shape[:-1], bool)
    return uvw, valid


def unproject(state: PlaneState, uvw: jax.Array) -> jax.Array:
    return apply_h(state.l2g, uvw)


def tangent(state: PlaneState, xyz, tan) -> jax.Array:
    """(impl/plane_traits.hpp:80-85; plane2 normalizes, plane does not —
    normalized here for both, the angle consumers are scale-invariant)."""
    t = rotate(state.g2l, tan)
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)


def normal(state: PlaneState, xyz, tan, nrm) -> jax.Array:
    n = rotate(state.g2l, nrm)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def intrinsic_distance(state: PlaneState, uvw0, uvw1, *, planar: bool = False) -> jax.Array:
    """3-D L2 for plane (impl/plane_traits.hpp:94-100); planar=True gives
    plane2's 2-D distance (impl/plane2_traits.hpp:111-116)."""
    d = uvw1 - uvw0
    if planar:
        d = d[..., :2]
    return jnp.linalg.norm(d, axis=-1)


def fit_from_samples3(ref_state: PlaneState, p1, p2, p3, n1, n2, n3) -> tuple[PlaneState, jax.Array]:
    """plane2's 3-point hypothesis with normal-consistency rejection
    (impl/plane2_traits.hpp:48-82): reject if any sample normal deviates
    from the plane normal by cos-gap > 0.1."""
    d1 = p2 - p1
    d2 = p3 - p1
    nrm = jnp.cross(d1, d2)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    ok = jnp.ones(p1.shape[:-1], bool)
    for n in (n1, n2, n3):
        cosa = jnp.sum(n * nrm, axis=-1)
        ok = ok & ((1.0 - jnp.abs(cosa)) <= 0.1)
    d1p = d1 - jnp.sum(d1 * nrm, -1, keepdims=True) * nrm
    d1p = d1p / jnp.maximum(jnp.linalg.norm(d1p, axis=-1, keepdims=True), 1e-12)
    d2p = jnp.cross(nrm, d1p)
    g2l = frame_to_g2l(p1, d1p, d2p, nrm)
    state = PlaneState(g2l, invert_rigid(g2l), p1, jnp.broadcast_to(ref_state.threshold, p1.shape[:-1]))
    return state, ok
