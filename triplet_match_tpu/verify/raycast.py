"""Batched point-sphere visibility verification (the OptiX raycaster analog).

Mirrors /root/reference/optix/RayCaster.cu:30-110 and include/raycaster:18-21:
for every model point, shoot a ray from a camera ``origin`` to the
pose-transformed point; the point is visible iff no occluder sphere
(transformed model points and scene points, radius ``point_radius``) is hit
strictly in front of it (with ``depth_tolerance`` slack).  The reference
builds OptiX BVHs and traces per ray; on TPU the ray-sphere tests become a
tiled matmul: lambda[i, j] = (occ_j - origin) . dir_i rides the MXU, the
perpendicular-distance and depth gates are elementwise, and visibility is a
row reduction.

The reference's usage (disabled at impl/scene.hpp:173-187) ORs visibility
over multiple origins and uses the visible count as the denominator of a
"cast score" — provided here as :func:`cast_score`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _visible_against(targets, t_lambda, dirs, origin, occ, occ_valid, point_radius,
                     depth_tolerance, block: int = 4096):
    """any-hit accumulation of occluders against all rays.

    targets/dirs: [M, 3]; t_lambda: [M]; occ: [N, 3].
    Returns [M] bool — True where some occluder blocks the ray.
    """
    n = occ.shape[0]
    nblocks = -(-n // block)
    pad = nblocks * block - n
    occ_p = jnp.pad(occ, ((0, pad), (0, 0)))
    val_p = jnp.pad(occ_valid, (0, pad))

    r2 = jnp.float32(point_radius) ** 2

    def tile(hit, args):
        occ_b, val_b = args
        rel = occ_b - origin  # [B, 3]
        lam = jnp.dot(dirs, rel.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # [M, B]
        d2 = jnp.sum(rel * rel, axis=-1)[None, :] - lam * lam
        blocked = (
            val_b[None, :]
            & (lam > 0.0)  # RayCaster.cu:58 (hitLambda < 0 -> miss)
            & (d2 <= r2)  # RayCaster.cu:62
            & (lam < t_lambda[:, None] - depth_tolerance)  # RayCaster.cu:67
        )
        return hit | jnp.any(blocked, axis=1), None

    hit, _ = lax.scan(
        tile,
        jnp.zeros(targets.shape[0], bool),
        (occ_p.reshape(nblocks, block, 3), val_p.reshape(nblocks, block)),
    )
    return hit


def cast_visibility(
    origin: jax.Array,
    model_xyz: jax.Array,
    model_valid: jax.Array,
    transform: jax.Array,
    scene_xyz: jax.Array,
    scene_valid: jax.Array,
    point_radius,
    depth_tolerance,
    *,
    block: int = 4096,
) -> jax.Array:
    """Visibility mask of transformed model points from one origin.

    Equivalent of ``raycaster::cast(origin, modelTransform, result)``
    (include/raycaster:18-21): returns [M] bool, True = visible (ray miss,
    RayCaster.cu:43-45).  Occluders are the transformed model points
    themselves and the scene points — a point is occluded by its own body
    (self-occlusion) or the scene.
    """
    origin = jnp.asarray(origin, jnp.float32)
    targets = model_xyz @ transform[:3, :3].T + transform[:3, 3]
    delta = targets - origin
    t_lambda = jnp.linalg.norm(delta, axis=-1)
    dirs = delta / jnp.maximum(t_lambda[:, None], 1e-12)

    hit_model = _visible_against(
        targets, t_lambda, dirs, origin, targets, model_valid,
        point_radius, depth_tolerance, block=block,
    )
    hit_scene = _visible_against(
        targets, t_lambda, dirs, origin, scene_xyz, scene_valid,
        point_radius, depth_tolerance, block=block,
    )
    return model_valid & ~(hit_model | hit_scene)


def cast_visibility_multi(origins, model_xyz, model_valid, transform,
                          scene_xyz, scene_valid, point_radius, depth_tolerance,
                          *, block: int = 4096) -> jax.Array:
    """OR of visibility over several origins (impl/scene.hpp:175-179)."""
    def one(origin):
        return cast_visibility(origin, model_xyz, model_valid, transform,
                               scene_xyz, scene_valid, point_radius,
                               depth_tolerance, block=block)

    vis = jax.vmap(one)(jnp.asarray(origins, jnp.float32))
    return jnp.any(vis, axis=0)


def cast_score(visible: jax.Array, corr_count) -> jax.Array:
    """matched / possible given a visibility mask (impl/scene.hpp:180-186).

    NOTE: this is the reference's raw formula — the numerator is the scene
    correspondence count (which can include relaxed-threshold clutter
    corrs), so the ratio can exceed 1.0.  Production verification uses
    :func:`cast_score_matched`, whose numerator counts matched VISIBLE
    model points and is <= 1 by construction.
    """
    possible = jnp.sum(visible.astype(jnp.int32))
    return jnp.where(
        possible > 0,
        corr_count / jnp.maximum(possible.astype(jnp.float32), 1.0),
        0.0,
    )


def cast_score_matched(visible: jax.Array, model_corrs: jax.Array) -> jax.Array:
    """Fraction of VISIBLE model points that found a correspondence.

    Fixes the reference formula's wart (impl/scene.hpp:180-186): counting
    matched visible model points makes 1.0 the exact "every visible point
    matched" ceiling, so ``min_cast_score`` thresholds are meaningful.

    visible: [M] bool; model_corrs: [K] int32 matched model indices.
    """
    matched = jnp.zeros(visible.shape[0], bool).at[model_corrs].set(True)
    num = jnp.sum((matched & visible).astype(jnp.int32)).astype(jnp.float32)
    possible = jnp.sum(visible.astype(jnp.int32))
    return jnp.where(possible > 0, num / jnp.maximum(possible.astype(jnp.float32), 1.0), 0.0)
