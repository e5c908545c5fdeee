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

import functools

import jax
import jax.numpy as jnp
import numpy as np
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
        # perpendicular distance via the CROSS product |rel x dir|^2: the
        # |rel|^2 - lam^2 form cancels catastrophically in f32 for
        # occluders far from the origin (|rel|^2 ~ 1e2 m^2 carries ~1e-5
        # absolute error — the size of r^2 for mm-scale point radii),
        # while each cross component differences products of mixed
        # magnitude (error ~ |rel| * eps).  Outer-product broadcasts only
        # — XLA fuses the chain into the same [M, B] working set.
        dx, dy, dz = (dirs[:, 0][:, None], dirs[:, 1][:, None],
                      dirs[:, 2][:, None])
        rx, ry, rz = (rel[:, 0][None, :], rel[:, 1][None, :],
                      rel[:, 2][None, :])
        c0 = dy * rz - dz * ry
        c1 = dz * rx - dx * rz
        c2 = dx * ry - dy * rx
        d2 = c0 * c0 + c1 * c1 + c2 * c2
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


def _ray_bundle(origin, model_xyz, model_valid, transform):
    """Transformed targets + unit ray directions for one origin."""
    targets = model_xyz @ transform[:3, :3].T + transform[:3, 3]
    delta = targets - origin
    t_lambda = jnp.linalg.norm(delta, axis=-1)
    dirs = delta / jnp.maximum(t_lambda[:, None], 1e-12)
    return targets, t_lambda, dirs


def _cone_keep_mask(origin, targets, t_lambda, dirs, model_valid,
                    scene_xyz, scene_valid, point_radius):
    """Conservative occluder cull for the ray bundle origin -> targets.

    All rays share one origin, so the bundle lies inside a cone: axis =
    normalized mean direction, half-angle alpha = max over valid rays.  An
    occluder sphere (center o, radius r) can block SOME ray only if

      * angle(o - origin, axis) <= alpha + asin(min(r / |o - origin|, 1))
        (it must come within r of a ray inside the cone), and
      * |o - origin|^2 <= max_t_lambda^2 + r^2
        (a hit needs lambda < t_lambda and perp^2 <= r^2, so
        |rel|^2 = lambda^2 + perp^2 < t_max^2 + r^2).

    Both bounds are exact necessary conditions — no blocked configuration
    is ever culled — so the pruned cast returns IDENTICAL masks to brute
    force (tested).  Returns [N] bool keep mask for the scene occluders.
    """
    big = jnp.float32(3.0e38)
    axis = jnp.sum(jnp.where(model_valid[:, None], dirs, 0.0), axis=0)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    cos_r = jnp.where(model_valid, dirs @ axis, 1.0)
    cos_alpha = jnp.clip(jnp.min(cos_r), -1.0, 1.0)
    alpha = jnp.arccos(cos_alpha)
    t_max = jnp.max(jnp.where(model_valid, t_lambda, 0.0))
    r = jnp.float32(point_radius)

    rel = scene_xyz - origin
    dist2 = jnp.sum(rel * rel, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
    beta = jnp.arcsin(jnp.clip(r / dist, 0.0, 1.0))
    cos_gate = jnp.cos(jnp.minimum(alpha + beta, jnp.float32(np.pi)))
    cos_o = (rel @ axis) / dist
    keep = scene_valid & (cos_o >= cos_gate) & (dist2 <= t_max * t_max + r * r)
    return keep


@jax.jit
def _keep_count(origin, model_xyz, model_valid, transform, scene_xyz,
                scene_valid, point_radius):
    """Survivor count of the cone cull — the only host sync of a pruned cast."""
    targets, t_lambda, dirs = _ray_bundle(origin, model_xyz, model_valid, transform)
    keep = _cone_keep_mask(origin, targets, t_lambda, dirs, model_valid,
                           scene_xyz, scene_valid, point_radius)
    return jnp.sum(keep.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("block",))
def _cast_brute(origin, model_xyz, model_valid, transform, scene_xyz,
                scene_valid, point_radius, depth_tolerance, block):
    targets, t_lambda, dirs = _ray_bundle(origin, model_xyz, model_valid, transform)
    hit_model = _visible_against(targets, t_lambda, dirs, origin, targets,
                                 model_valid, point_radius, depth_tolerance,
                                 block=min(block, targets.shape[0]))
    hit_scene = _visible_against(targets, t_lambda, dirs, origin, scene_xyz,
                                 scene_valid, point_radius, depth_tolerance,
                                 block=block)
    return model_valid & ~(hit_model | hit_scene)


@functools.partial(jax.jit, static_argnames=("cap", "block"))
def _cast_pruned(origin, model_xyz, model_valid, transform, scene_xyz,
                 scene_valid, point_radius, depth_tolerance, cap, block):
    """One program: cone cull -> device-side compaction -> exact sweep.

    ``cap`` (static) bounds the compacted occluder set; the caller sizes it
    from :func:`_keep_count` rounded to the next power of two, so recompiles
    are bounded at ~log2(N) shapes and the scene never round-trips the host.
    """
    targets, t_lambda, dirs = _ray_bundle(origin, model_xyz, model_valid, transform)
    keep = _cone_keep_mask(origin, targets, t_lambda, dirs, model_valid,
                           scene_xyz, scene_valid, point_radius)
    n = scene_xyz.shape[0]
    idx = jnp.nonzero(keep, size=cap, fill_value=n)[0]
    occ = jnp.take(scene_xyz, jnp.minimum(idx, n - 1), axis=0)
    occ_valid = idx < n
    hit_model = _visible_against(targets, t_lambda, dirs, origin, targets,
                                 model_valid, point_radius, depth_tolerance,
                                 block=min(block, targets.shape[0]))
    hit_scene = _visible_against(targets, t_lambda, dirs, origin, occ,
                                 occ_valid, point_radius, depth_tolerance,
                                 block=min(block, cap))
    return model_valid & ~(hit_model | hit_scene)


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
    prune: bool = True,
) -> jax.Array:
    """Visibility mask of transformed model points from one origin.

    Equivalent of ``raycaster::cast(origin, modelTransform, result)``
    (include/raycaster:18-21): returns [M] bool, True = visible (ray miss,
    RayCaster.cu:43-45).  Occluders are the transformed model points
    themselves and the scene points — a point is occluded by its own body
    (self-occlusion) or the scene.

    ``prune=True`` first culls scene occluders with the conservative
    cone-and-range test (:func:`_cone_keep_mask`) and runs the exact
    ray-sphere sweep only on the compacted survivors — the TPU analog of
    the OptiX BVH's broad phase (raycaster.ipp:1-121).  For a camera
    looking at a model inside a large scene, survivors are the points
    between the origin and the model, so the O(M x N) sweep shrinks by the
    cone/scene volume ratio at identical output (the cull is a necessary
    condition, never sufficient).  Survivor capacity is padded to the next
    power of two, bounding recompiles at ~log2(N) shapes.

    The pruned path sizes the compacted occluder buffer on the HOST (one
    device sync for the survivor count), so it cannot run under an outer
    ``jit``/``vmap`` trace; traced inputs automatically fall back to the
    brute sweep, which is pure JAX.  Call un-jitted (the sub-programs are
    jitted internally) to get the broad phase.
    """
    origin = jnp.asarray(origin, jnp.float32)
    point_radius = jnp.float32(point_radius)
    depth_tolerance = jnp.float32(depth_tolerance)

    if prune and not any(
        isinstance(a, jax.core.Tracer)
        for a in (origin, model_xyz, model_valid, transform, scene_xyz,
                  scene_valid)
    ):
        count = int(_keep_count(origin, model_xyz, model_valid, transform,
                                scene_xyz, scene_valid, point_radius))
        cap = max(int(2 ** np.ceil(np.log2(max(count, 1)))), block)
        cap = min(cap, int(scene_xyz.shape[0]))
        if cap < scene_xyz.shape[0]:
            return _cast_pruned(origin, model_xyz, model_valid, transform,
                                scene_xyz, scene_valid, point_radius,
                                depth_tolerance, cap=cap, block=block)

    return _cast_brute(origin, model_xyz, model_valid, transform, scene_xyz,
                       scene_valid, point_radius, depth_tolerance, block=block)


def cast_visibility_multi(origins, model_xyz, model_valid, transform,
                          scene_xyz, scene_valid, point_radius, depth_tolerance,
                          *, block: int = 4096, prune: bool = True) -> jax.Array:
    """OR of visibility over several origins (impl/scene.hpp:175-179).

    Origins iterate on the host (there are 1-4 of them) so each cast can
    run its occluder cull + compaction; the per-origin masks OR together.
    """
    origins = np.asarray(origins, np.float32).reshape(-1, 3)
    if origins.shape[0] == 0:
        raise ValueError(
            "cast_visibility_multi needs at least one origin; pass "
            "raycast_origins=None to skip verification entirely")
    vis = None
    for o in origins:
        v = cast_visibility(jnp.asarray(o), model_xyz, model_valid, transform,
                            scene_xyz, scene_valid, point_radius,
                            depth_tolerance, block=block, prune=prune)
        vis = v if vis is None else (vis | v)
    return vis


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
