"""Cylinder projector (``cylinder_traits``).

Mirrors /root/reference/include/impl/cylinder_traits.hpp.  The reference
fits with PCL's MSAC (impl:6-51); the TPU-native fit is a *batched* RANSAC:
vmap the 2-point+normals closed-form hypothesis (impl:53-98) over many
sample pairs, score all hypotheses against all points with an MSAC loss in
one pass, and keep the argmin.  The chart is the unrolled cylinder:
u = r*theta in [0, 2*pi*r), v = height along the axis, w = radial deviation
relative to r (impl:100-114); tangents/normals push forward through the
chart Jacobian (impl:132-178); intrinsic distance wraps around u
(impl:180-189).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from triplet_match_tpu.core.transforms import invert_rigid
from triplet_match_tpu.primitives.base import apply_h, frame_to_g2l, rotate, unit_orthogonal

_TWO_PI = 2.0 * jnp.pi


class CylinderState(NamedTuple):
    g2l: jax.Array  # [..., 4, 4] world -> cylinder frame (z = axis)
    l2g: jax.Array
    origin: jax.Array  # [..., 3] a point on the axis
    radius: jax.Array  # [...]
    threshold: jax.Array  # [...]


def _state_from_axis(origin, axis, radius, threshold) -> CylinderState:
    ref = unit_orthogonal(axis)
    ey = jnp.cross(ref, axis)
    g2l = frame_to_g2l(origin, ref, ey, axis)
    return CylinderState(g2l, invert_rigid(g2l), origin, radius, threshold)


def fit_from_samples(ref_state, p1, p2, n1, n2) -> tuple[CylinderState, jax.Array]:
    """Closed-form 2-point+normals cylinder (impl/cylinder_traits.hpp:53-98).

    The axis is the closest-approach line between the two normal lines.
    Batched over leading axes.  Returns (state, plausibility) where
    plausibility rejects non-finite/degenerate solutions.
    """
    w = n1 + p1 - p2
    a = jnp.sum(n1 * n1, -1)
    b = jnp.sum(n1 * n2, -1)
    c = jnp.sum(n2 * n2, -1)
    d = jnp.sum(n1 * w, -1)
    e = jnp.sum(n2 * w, -1)
    denom = a * c - b * b
    sc_deg = jnp.zeros_like(denom)
    tc_deg = jnp.where(b > c, d / jnp.where(b == 0, 1.0, b), e / jnp.where(c == 0, 1.0, c))
    sc = jnp.where(denom < 1e-8, sc_deg, (b * e - c * d) / jnp.where(denom == 0, 1.0, denom))
    tc = jnp.where(denom < 1e-8, tc_deg, (a * e - b * d) / jnp.where(denom == 0, 1.0, denom))

    origin = p1 + n1 + sc[..., None] * n1
    axis = p2 + tc[..., None] * n2 - origin
    axis_norm = jnp.linalg.norm(axis, axis=-1)
    axis = axis / jnp.maximum(axis_norm[..., None], 1e-12)
    radius = jnp.linalg.norm(jnp.cross(axis, origin - p1), axis=-1)

    thr = jnp.broadcast_to(ref_state.threshold if ref_state is not None else jnp.float32(0.0), radius.shape)
    state = _state_from_axis(origin, axis, radius, thr)
    ok = (axis_norm > 1e-8) & (radius > 1e-6) & jnp.isfinite(radius)
    return state, ok


def fit_from_cloud(cloud, mask=None, *, key=None, num_hypotheses: int = 256,
                   threshold: jax.Array | None = None, probability: float = 0.99) -> CylinderState:
    """Batched-RANSAC MSAC cylinder fit (replaces PCL MEstimatorSampleConsensus,
    impl/cylinder_traits.hpp:6-51).

    Samples ``num_hypotheses`` point pairs, builds closed-form cylinders,
    scores every hypothesis against every valid point with the truncated
    squared radial residual (MSAC), and returns the best.  Threshold
    defaults to 5 * cloud resolution like the reference (impl:19).
    """
    from triplet_match_tpu.core.cloud import resolution as cloud_resolution

    if mask is None:
        mask = cloud.valid
    if key is None:
        key = jax.random.PRNGKey(0)
    if threshold is None:
        threshold = 5.0 * cloud_resolution(cloud)
    threshold = jnp.asarray(threshold, jnp.float32)

    n = cloud.xyz.shape[0]
    k1, k2 = jax.random.split(key)
    g = jax.random.gumbel(k1, (2 * num_hypotheses, n))
    logits = jnp.where(mask, 0.0, -jnp.inf)
    idx = jnp.argmax(g + logits, axis=-1).reshape(2, num_hypotheses)
    p1, p2 = cloud.xyz[idx[0]], cloud.xyz[idx[1]]
    n1, n2 = cloud.normal[idx[0]], cloud.normal[idx[1]]

    ref = CylinderState(
        jnp.eye(4), jnp.eye(4), jnp.zeros(3), jnp.float32(1.0), threshold
    )
    states, ok = fit_from_samples(ref, p1, p2, n1, n2)  # batched [H]

    # MSAC score: sum over points of min(residual^2, threshold^2)
    w = mask.astype(jnp.float32)

    def msac(state_ok):
        state, valid_h = state_ok
        loc = apply_h(state.g2l, cloud.xyz)  # [N, 3]
        radial = jnp.linalg.norm(loc[..., :2], axis=-1) - state.radius
        r2 = jnp.minimum(jnp.square(radial), jnp.square(threshold))
        cost = jnp.sum(r2 * w)
        return jnp.where(valid_h, cost, jnp.inf)

    costs = jax.lax.map(msac, (states, ok))
    best = jnp.argmin(costs)
    best_state = jax.tree_util.tree_map(lambda a: a[best], states)
    return CylinderState(
        best_state.g2l, best_state.l2g, best_state.origin, best_state.radius,
        jnp.broadcast_to(threshold, best_state.radius.shape),
    )


def project(state: CylinderState, xyz: jax.Array):
    """(uvw, valid): u = r*theta, v = z, w = radial deviation / r; reject
    |radial - r| > threshold (impl/cylinder_traits.hpp:100-114)."""
    loc = apply_h(state.g2l, xyz)
    rad = jnp.linalg.norm(loc[..., :2], axis=-1)
    height = rad - state.radius
    valid = jnp.abs(height) <= state.threshold
    theta = jnp.arctan2(loc[..., 1], loc[..., 0])
    theta = jnp.where(theta < 0, theta + _TWO_PI, theta)
    uvw = jnp.stack([theta * state.radius, loc[..., 2], height / state.radius], axis=-1)
    return uvw, valid


def unproject(state: CylinderState, uvw: jax.Array) -> jax.Array:
    """(impl/cylinder_traits.hpp:116-130)."""
    r = (uvw[..., 2] + 1.0) * state.radius
    ang = uvw[..., 0] / state.radius
    loc = jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang), uvw[..., 1]], axis=-1)
    return apply_h(state.l2g, loc)


def _chart_pushforward(state: CylinderState, xyz: jax.Array, vec: jax.Array) -> jax.Array:
    """Jacobian push-forward of a world vector at a point into uvw
    (impl/cylinder_traits.hpp:132-154)."""
    loc = apply_h(state.g2l, xyz)
    lv = rotate(state.g2l, vec)
    lv = lv / jnp.maximum(jnp.linalg.norm(lv, axis=-1, keepdims=True), 1e-12)
    r = state.radius
    n = jnp.linalg.norm(loc[..., :2], axis=-1)
    s = n * n
    t0 = lv[..., 0] * (-r * loc[..., 1] / s) + lv[..., 1] * (r * loc[..., 0] / s)
    t1 = lv[..., 2]
    t2 = lv[..., 0] * loc[..., 0] / n + lv[..., 1] * loc[..., 1] / n
    t = jnp.stack([t0, t1, t2], axis=-1)
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)


def tangent(state: CylinderState, xyz, tan) -> jax.Array:
    return _chart_pushforward(state, xyz, tan)


def normal(state: CylinderState, xyz, tan, nrm) -> jax.Array:
    """Push both surface tangents forward and take their cross product
    (impl/cylinder_traits.hpp:156-178)."""
    t2 = jnp.cross(tan, nrm)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-12)
    u1 = _chart_pushforward(state, xyz, tan)
    u2 = _chart_pushforward(state, xyz, t2)
    c = jnp.cross(u1, u2)
    return c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-12)


def intrinsic_distance(state: CylinderState, uvw0, uvw1) -> jax.Array:
    """Wrap-around chart distance (impl/cylinder_traits.hpp:180-189)."""
    d_u = jnp.abs(uvw1[..., 0] - uvw0[..., 0])
    d_u = jnp.minimum(d_u, _TWO_PI * state.radius - d_u)
    d_v = jnp.abs(uvw1[..., 1] - uvw0[..., 1])
    return jnp.sqrt(d_u * d_u + d_v * d_v)
