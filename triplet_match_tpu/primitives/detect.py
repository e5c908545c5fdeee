"""Primitive detection: batched-RANSAC plane / cylinder extraction.

The acceptance configs (BASELINE.json 1-2) call for plane and cylinder
primitive detection.  The reference delegates cylinder fitting to PCL MSAC
(impl/cylinder_traits.hpp:6-51) and never wires a detection loop; here
detection is a first-class batched op: vmapped minimal-sample hypotheses,
one MSAC scoring pass over all points, argmin, then an inlier mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from triplet_match_tpu.primitives import cylinder as cyl
from triplet_match_tpu.primitives import plane as pln
from triplet_match_tpu.primitives.base import apply_h


class PlaneDetection(NamedTuple):
    state: pln.PlaneState
    inliers: jax.Array  # [N] bool


class CylinderDetection(NamedTuple):
    state: cyl.CylinderState
    inliers: jax.Array  # [N] bool


def detect_plane(cloud, mask=None, *, key=None, num_hypotheses: int = 256,
                 threshold=None) -> PlaneDetection:
    """RANSAC plane detection from 1-point+normal hypotheses
    (plane_traits' init_from_samples, impl/plane_traits.hpp:44-62)."""
    from triplet_match_tpu.core.cloud import resolution as cloud_resolution

    if mask is None:
        mask = cloud.valid
    if key is None:
        key = jax.random.PRNGKey(0)
    if threshold is None:
        threshold = 3.0 * cloud_resolution(cloud)
    threshold = jnp.asarray(threshold, jnp.float32)

    n = cloud.xyz.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    logits = jnp.where(mask, 0.0, -jnp.inf)
    idx = jnp.argmax(g + logits, axis=-1)
    p = cloud.xyz[idx]
    nr = cloud.normal[idx]

    ref = pln.PlaneState(jnp.eye(4), jnp.eye(4), jnp.zeros(3), threshold)
    states, _ = pln.fit_from_samples(ref, p, nr)

    w = mask.astype(jnp.float32)

    def msac(state):
        h = apply_h(state.g2l, cloud.xyz)[..., 2]
        r2 = jnp.minimum(jnp.square(h), jnp.square(threshold))
        return jnp.sum(r2 * w)

    costs = jax.lax.map(msac, states)
    best = jnp.argmin(costs)
    state = jax.tree_util.tree_map(lambda a: a[best], states)
    h = apply_h(state.g2l, cloud.xyz)[..., 2]
    inliers = mask & (jnp.abs(h) <= threshold)
    return PlaneDetection(state, inliers)


def detect_cylinder(cloud, mask=None, *, key=None, num_hypotheses: int = 256,
                    threshold=None) -> CylinderDetection:
    """RANSAC cylinder detection (PCL MSAC replacement)."""
    state = cyl.fit_from_cloud(cloud, mask, key=key, num_hypotheses=num_hypotheses,
                               threshold=threshold)
    if mask is None:
        mask = cloud.valid
    loc = apply_h(state.g2l, cloud.xyz)
    radial = jnp.abs(jnp.linalg.norm(loc[..., :2], axis=-1) - state.radius)
    inliers = mask & (radial <= state.threshold)
    return CylinderDetection(state, inliers)


class SphereDetection(NamedTuple):
    state: "sph.SphereState"
    inliers: jax.Array  # [N] bool


def detect_sphere(cloud, mask=None, *, key=None, num_hypotheses: int = 256,
                  threshold=None) -> SphereDetection:
    """RANSAC sphere detection from 2-point+normal hypotheses
    (primitives/sphere.py — the cylinder_traits MSAC recipe on the one
    quadric the reference's trait set lacks)."""
    from triplet_match_tpu.primitives import sphere as sph

    state = sph.fit_from_cloud(cloud, mask, key=key,
                               num_hypotheses=num_hypotheses,
                               threshold=threshold)
    if mask is None:
        mask = cloud.valid
    radial = jnp.abs(jnp.linalg.norm(cloud.xyz - state.center, axis=-1)
                     - state.radius)
    inliers = mask & (radial <= state.threshold)
    return SphereDetection(state, inliers)
