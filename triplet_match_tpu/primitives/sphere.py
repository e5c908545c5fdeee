"""Sphere projector trait: (u, v, w) spherical chart + batched-RANSAC fit.

The reference ships four projector traits (identity/plane/plane2/cylinder,
/root/reference/include/*_traits); a sphere is the one quadric the set
conspicuously lacks for scanned CAD parts (ball joints, domes, fillet
probes).  Same pure-function bundle contract as primitives/base.py, same
construction recipe as cylinder_traits (closed-form minimal fit from
point+normal samples -> batched MSAC, impl/cylinder_traits.hpp:6-51):

  * minimal fit: TWO points with normals — the center is the midpoint of
    the closest-approach segment between the two normal lines (for a true
    sphere all normal lines pass through the center), the radius the mean
    center distance;
  * chart: u = r * azimuth, v = r * (polar - pi/2) (equator-centered so u
    distances are least distorted where inliers live), w = radial
    deviation / r — mirroring the cylinder chart's (r*theta, z, dr/r)
    convention (impl/cylinder_traits.hpp:100-114);
  * intrinsic distance: great-circle arc between the chart directions
    (the sphere analog of the cylinder's wrap-around u distance,
    impl/cylinder_traits.hpp:180-189).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from triplet_match_tpu.core.transforms import invert_rigid
from triplet_match_tpu.primitives.base import (
    apply_h,
    frame_to_g2l,
    rotate,
    unit_orthogonal,
)

_TWO_PI = 6.283185307179586


class SphereState(NamedTuple):
    g2l: jax.Array  # [..., 4, 4] world -> sphere frame (origin = center)
    l2g: jax.Array
    center: jax.Array  # [..., 3]
    radius: jax.Array  # [...]
    threshold: jax.Array  # [...]


def _state_from_center(center, radius, threshold, *, ez=None) -> SphereState:
    """Frame at the center; ``ez`` picks the chart pole (default world z —
    any orthonormal frame is valid for a sphere)."""
    if ez is None:
        ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                              center.shape)
    ez = ez / jnp.maximum(jnp.linalg.norm(ez, axis=-1, keepdims=True), 1e-12)
    ex = unit_orthogonal(ez)
    ey = jnp.cross(ez, ex)
    g2l = frame_to_g2l(center, ex, ey, ez)
    return SphereState(g2l, invert_rigid(g2l), center, radius, threshold)


def fit_from_samples(ref_state, p1, p2, n1, n2) -> tuple[SphereState, jax.Array]:
    """Closed-form 2-point+normals sphere; batched over leading axes.

    Both normal lines of a true sphere pass through the center: take the
    closest-approach midpoint of lines (p1, n1) and (p2, n2) as the center
    (the same two-line kernel the cylinder fit uses for its axis,
    impl/cylinder_traits.hpp:53-98) and the mean point distance as the
    radius.  Plausibility rejects near-parallel normals (center
    unobservable) and solutions whose two radii disagree by more than 20%
    (the samples were not on one sphere).
    """
    w = p1 - p2
    a = jnp.sum(n1 * n1, -1)
    b = jnp.sum(n1 * n2, -1)
    c = jnp.sum(n2 * n2, -1)
    d = jnp.sum(n1 * w, -1)
    e = jnp.sum(n2 * w, -1)
    denom = a * c - b * b
    safe = jnp.where(denom == 0, 1.0, denom)
    sc = (b * e - c * d) / safe
    tc = (a * e - b * d) / safe
    q1 = p1 + sc[..., None] * n1
    q2 = p2 + tc[..., None] * n2
    center = 0.5 * (q1 + q2)
    r1 = jnp.linalg.norm(p1 - center, axis=-1)
    r2 = jnp.linalg.norm(p2 - center, axis=-1)
    radius = 0.5 * (r1 + r2)
    gap = jnp.linalg.norm(q1 - q2, axis=-1)

    thr = jnp.broadcast_to(
        ref_state.threshold if ref_state is not None else jnp.float32(0.0),
        radius.shape)
    state = _state_from_center(center, radius, thr)
    ok = (
        (denom > 1e-8)  # normals not parallel
        & (radius > 1e-6)
        & jnp.isfinite(radius)
        & (jnp.abs(r1 - r2) <= 0.2 * jnp.maximum(radius, 1e-9))
        & (gap <= 0.2 * jnp.maximum(radius, 1e-9))
    )
    return state, ok


def fit_from_cloud(cloud, mask=None, *, key=None, num_hypotheses: int = 256,
                   threshold: jax.Array | None = None) -> SphereState:
    """Batched-RANSAC MSAC sphere fit (cylinder_traits recipe,
    impl/cylinder_traits.hpp:6-51): sample point pairs, closed-form
    spheres, truncated squared radial residual, keep the best."""
    from triplet_match_tpu.core.cloud import resolution as cloud_resolution

    if mask is None:
        mask = cloud.valid
    if key is None:
        key = jax.random.PRNGKey(0)
    if threshold is None:
        threshold = 5.0 * cloud_resolution(cloud)
    threshold = jnp.asarray(threshold, jnp.float32)

    n = cloud.xyz.shape[0]
    k1, _ = jax.random.split(key)
    g = jax.random.gumbel(k1, (2 * num_hypotheses, n))
    logits = jnp.where(mask, 0.0, -jnp.inf)
    idx = jnp.argmax(g + logits, axis=-1).reshape(2, num_hypotheses)
    p1, p2 = cloud.xyz[idx[0]], cloud.xyz[idx[1]]
    n1, n2 = cloud.normal[idx[0]], cloud.normal[idx[1]]

    ref = SphereState(jnp.eye(4), jnp.eye(4), jnp.zeros(3), jnp.float32(1.0),
                      threshold)
    states, ok = fit_from_samples(ref, p1, p2, n1, n2)  # batched [H]

    w = mask.astype(jnp.float32)

    def msac(state_ok):
        state, valid_h = state_ok
        radial = jnp.linalg.norm(cloud.xyz - state.center, axis=-1) - state.radius
        r2 = jnp.minimum(jnp.square(radial), jnp.square(threshold))
        cost = jnp.sum(r2 * w)
        return jnp.where(valid_h, cost, jnp.inf)

    costs = jax.lax.map(msac, (states, ok))
    best = jnp.argmin(costs)
    best_state = jax.tree_util.tree_map(lambda a: a[best], states)
    return SphereState(
        best_state.g2l, best_state.l2g, best_state.center, best_state.radius,
        jnp.broadcast_to(threshold, best_state.radius.shape),
    )


def project(state: SphereState, xyz: jax.Array):
    """(uvw, valid): u = r*azimuth, v = r*(polar - pi/2), w = radial
    deviation / r; reject |radial - r| > threshold (the cylinder chart's
    convention on the sphere, impl/cylinder_traits.hpp:100-114)."""
    loc = apply_h(state.g2l, xyz)
    rad = jnp.linalg.norm(loc, axis=-1)
    height = rad - state.radius
    valid = jnp.abs(height) <= state.threshold
    az = jnp.arctan2(loc[..., 1], loc[..., 0])
    az = jnp.where(az < 0, az + _TWO_PI, az)
    polar = jnp.arccos(jnp.clip(loc[..., 2] / jnp.maximum(rad, 1e-12), -1.0, 1.0))
    uvw = jnp.stack(
        [az * state.radius, (polar - 0.5 * jnp.pi) * state.radius,
         height / state.radius], axis=-1)
    return uvw, valid


def unproject(state: SphereState, uvw: jax.Array) -> jax.Array:
    r = (uvw[..., 2] + 1.0) * state.radius
    az = uvw[..., 0] / state.radius
    polar = uvw[..., 1] / state.radius + 0.5 * jnp.pi
    sp = jnp.sin(polar)
    loc = jnp.stack([r * sp * jnp.cos(az), r * sp * jnp.sin(az),
                     r * jnp.cos(polar)], axis=-1)
    return apply_h(state.l2g, loc)


def _chart_pushforward(state: SphereState, xyz: jax.Array, vec: jax.Array) -> jax.Array:
    """Jacobian push-forward of a world vector at a point into uvw
    (analytic, the cylinder pushforward pattern,
    impl/cylinder_traits.hpp:132-154)."""
    loc = apply_h(state.g2l, xyz)
    lv = rotate(state.g2l, vec)
    lv = lv / jnp.maximum(jnp.linalg.norm(lv, axis=-1, keepdims=True), 1e-12)
    r = state.radius
    x, y, z = loc[..., 0], loc[..., 1], loc[..., 2]
    s2 = jnp.maximum(x * x + y * y, 1e-18)  # squared distance to the pole axis
    rad = jnp.maximum(jnp.linalg.norm(loc, axis=-1), 1e-12)
    # du = r * d(atan2(y, x)); dv = r * d(acos(z / |p|)); dw = d(|p|) / r
    t0 = r * (lv[..., 1] * x - lv[..., 0] * y) / s2
    dzn = lv[..., 2] / rad - z * jnp.sum(lv * loc, -1) / (rad ** 3)
    t1 = r * (-dzn) / jnp.maximum(jnp.sqrt(1.0 - jnp.clip((z / rad) ** 2, 0.0, 1.0 - 1e-12)), 1e-9)
    t2 = jnp.sum(lv * loc, -1) / rad
    t = jnp.stack([t0, t1, t2], axis=-1)
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)


def tangent(state: SphereState, xyz, tan) -> jax.Array:
    return _chart_pushforward(state, xyz, tan)


def normal(state: SphereState, xyz, tan, nrm) -> jax.Array:
    """Cross of two pushed-forward surface tangents (the cylinder normal
    recipe, impl/cylinder_traits.hpp:156-178)."""
    t2 = jnp.cross(tan, nrm)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-12)
    u1 = _chart_pushforward(state, xyz, tan)
    u2 = _chart_pushforward(state, xyz, t2)
    c = jnp.cross(u1, u2)
    return c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-12)


def intrinsic_distance(state: SphereState, uvw0, uvw1) -> jax.Array:
    """Great-circle distance between the chart directions (the sphere
    analog of the cylinder wrap distance, impl/cylinder_traits.hpp:180-189)."""
    def direction(uvw):
        az = uvw[..., 0] / state.radius
        polar = uvw[..., 1] / state.radius + 0.5 * jnp.pi
        sp = jnp.sin(polar)
        return jnp.stack([sp * jnp.cos(az), sp * jnp.sin(az), jnp.cos(polar)],
                         axis=-1)

    d0, d1 = direction(uvw0), direction(uvw1)
    cosang = jnp.clip(jnp.sum(d0 * d1, -1), -1.0, 1.0)
    return state.radius * jnp.arccos(cosang)
