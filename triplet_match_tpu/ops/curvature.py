"""Principal-curvature estimation (vmapped eigendecomposition).

Mirrors ``principal_curvatures`` (/root/reference/include/impl/pointcloud.hpp:3-44):
for each point, project the k-NN neighborhood normals onto the point's
tangent plane (``M = I - n n^T``), form the covariance of the demeaned
projected normals, and eigendecompose.  The reference (via ``pcl::eigen33``)
returns eigenvalues in ascending order and reports

  pc_min = ev[1] / k,  pc_max = ev[2] / k,  pc_max_dir = eigvec(ev[2]).

Only the ratio pc_min/pc_max is consumed by the live match path (edge-point
filter at /root/reference/include/impl/model.hpp:96-99 and impl/scene.hpp:50);
the direction is carried for API parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from triplet_match_tpu.ops.knn import knn


class CurvatureInfo(NamedTuple):
    pc_max_dir: jax.Array  # [N, 3]
    pc_min: jax.Array  # [N]
    pc_max: jax.Array  # [N]


def curvature_from_neighbors(q_normal: jax.Array, nbr_normals: jax.Array,
                             nbr_mask: jax.Array | None = None) -> CurvatureInfo:
    """Curvature statistics from gathered neighborhood normals.

    The single home of the projected-normal-covariance math
    (impl/pointcloud.hpp:3-44), shared by every caller so the brute-force
    and grid-bucketed neighbor paths cannot drift.

    q_normal: [..., 3]; nbr_normals: [..., K, 3]; nbr_mask: optional [..., K]
    (masked slots are excluded from the centroid/covariance and the 1/count
    eigenvalue scale — the masked analog of the reference's exact-k loop).
    """
    n = q_normal
    # proj = (I - n n^T) nbr  ==  nbr - (nbr . n) n
    dots = jnp.einsum("...kd,...d->...k", nbr_normals, n)
    proj = nbr_normals - dots[..., None] * n[..., None, :]  # [..., K, 3]

    if nbr_mask is None:
        cnt = jnp.float32(nbr_normals.shape[-2])
        centroid = jnp.mean(proj, axis=-2, keepdims=True)
        demean = proj - centroid
    else:
        m = nbr_mask[..., None].astype(proj.dtype)
        cnt = jnp.maximum(jnp.sum(nbr_mask.astype(jnp.float32), axis=-1), 1.0)
        centroid = jnp.sum(proj * m, axis=-2, keepdims=True) / cnt[..., None, None]
        demean = (proj - centroid) * m
    # Raw scatter (no 1/k) exactly like the reference accumulation
    # (impl/pointcloud.hpp:17-36); the 1/k lands on the eigenvalues.
    cov = jnp.einsum("...kd,...ke->...de", demean, demean)

    evs, evecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    area_inv = 1.0 / cnt
    return CurvatureInfo(
        pc_max_dir=evecs[..., 2],
        pc_min=evs[..., 1] * area_inv,
        pc_max=evs[..., 2] * area_inv,
    )


def principal_curvatures(cloud, k: int = 30, *, block: int = 512) -> CurvatureInfo:
    """Per-point principal curvature info over the full (padded) cloud."""
    # approximate candidate precision: curvature is a neighborhood statistic
    idx, d2 = knn(cloud.xyz, cloud.xyz, cloud.valid, k, block=block,
                  approx_candidates=True)  # [N, k]
    # clouds with fewer than k valid points leave unfilled slots (index 0,
    # d2 = +inf); mask them or point 0's normal pollutes every covariance
    return curvature_from_neighbors(cloud.normal, cloud.normal[idx],
                                    nbr_mask=d2 < 3e38)


def estimate_edge_tangents(cloud, k: int = 30, *, curvature_ratio_threshold: float = 0.2,
                           min_pc_max: float = 1e-3) -> jax.Array:
    """Estimate edge tangents for clouds that lack them.

    The reference assumes tangents arrive precomputed in
    ``PointSurfel.data_c[1..3]`` (include/common:62-70) from an upstream
    tool.  This op derives them from geometry: at a crease, the dominant
    eigenvector of the projected-normal covariance (``pc_max_dir``) is
    perpendicular to both face normals in the tangent plane — i.e. the
    normal-variation direction; the edge direction is ``normal x pc_max_dir``.
    Non-edge points (curvature ratio above threshold, or normal variation
    below the ``min_pc_max`` significance floor — flat regions have
    near-zero covariance whose eigenvalue ratio is numerical noise) get zero
    tangents, matching the convention the edge filter expects
    (impl/model.hpp:96-99).

    Returns [N, 3] tangents (unit on detected edges, zero elsewhere).
    """
    curv = principal_curvatures(cloud, k=k)
    ratio = curvature_ratio(curv)
    is_edge = cloud.valid & (ratio < curvature_ratio_threshold) & (curv.pc_max > min_pc_max)
    t = jnp.cross(cloud.normal, curv.pc_max_dir)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return jnp.where(is_edge[:, None], t, 0.0)


def curvature_ratio(curv: CurvatureInfo) -> jax.Array:
    """pc_min/pc_max with the zero-pc_max -> +inf convention.

    A zero pc_max (perfectly coherent normals) yields ratio=+inf -> never an
    edge, matching the reference's NaN-compares-false behavior
    (impl/model.hpp:98).  Single home for the formula — every edge
    classification path must go through it.
    """
    return jnp.where(
        curv.pc_max > 0.0, curv.pc_min / jnp.maximum(curv.pc_max, 1e-30), jnp.inf
    )


def edge_mask(cloud, curv: CurvatureInfo, *, tangent_norm_threshold: float = 0.7,
              curvature_ratio_threshold: float = 0.2) -> jax.Array:
    """Edge-point classification.

    Mirrors the subset filter ``tangent.norm() > 0.7 && pc_min/pc_max < 0.2``
    (/root/reference/include/impl/model.hpp:96-99, impl/scene.hpp:50).
    """
    tnorm = jnp.linalg.norm(cloud.tangent, axis=-1)
    ratio = curvature_ratio(curv)
    return cloud.valid & (tnorm > tangent_norm_threshold) & (ratio < curvature_ratio_threshold)
