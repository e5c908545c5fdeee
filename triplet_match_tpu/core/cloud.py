"""Struct-of-arrays point cloud pytree.

TPU-native replacement for the reference's ``pointcloud<Point>`` (a
``pcl::PointCloud`` subclass with a lazy kd-tree, cached resolution/diameter
and knn/radius queries — /root/reference/include/pointcloud:30-82,
include/impl/pointcloud.hpp).  Pointer-chasing kd-trees do not map to the
TPU; spatial queries are provided as batched dense ops in
:mod:`triplet_match_tpu.ops.knn` instead.  The cloud itself is a static-shape
pytree with a validity mask so clouds of any logical size share one compiled
program per padded capacity.

The reference stores tangents in ``PointSurfel.data_c[1..3]``
(/root/reference/include/common:62-70); here tangents are a first-class
``[N,3]`` array.  Points with near-zero tangent norm are "surface" points,
points with unit tangent are "edge" points (tangent-norm test at
/root/reference/include/impl/model.hpp:96-99).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["xyz", "normal", "tangent", "valid"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Padded struct-of-arrays point cloud.

    Attributes:
      xyz:     [N, 3] float32 positions (padding rows arbitrary but finite-safe).
      normal:  [N, 3] float32 surface normals.
      tangent: [N, 3] float32 edge tangents (zero for non-edge points).
      valid:   [N]    bool    validity mask (False for padding).
    """

    xyz: jax.Array
    normal: jax.Array
    tangent: jax.Array
    valid: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jax.Array:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def from_arrays(xyz, normal=None, tangent=None, valid=None, capacity: int | None = None) -> "PointCloud":
        """Build a cloud from host arrays, padding to ``capacity``."""
        xyz = np.asarray(xyz, np.float32)
        n = xyz.shape[0]
        if normal is None:
            normal = np.zeros_like(xyz)
        if tangent is None:
            tangent = np.zeros_like(xyz)
        if valid is None:
            valid = np.ones((n,), bool)
        normal = np.asarray(normal, np.float32)
        tangent = np.asarray(tangent, np.float32)
        valid = np.asarray(valid, bool)
        # finite-sanitize up front (reference: impl/model.hpp:24-30): rows
        # with NaN/inf in any field are invalidated AND zeroed so the
        # arithmetic masking idioms downstream stay NaN-safe (finite_filter)
        finite = (
            np.isfinite(xyz).all(axis=-1)
            & np.isfinite(normal).all(axis=-1)
            & np.isfinite(tangent).all(axis=-1)
        )
        if not finite.all():
            xyz = np.where(finite[:, None], xyz, 0.0).astype(np.float32)
            normal = np.where(finite[:, None], normal, 0.0).astype(np.float32)
            tangent = np.where(finite[:, None], tangent, 0.0).astype(np.float32)
            valid = valid & finite
        cap = capacity or n
        if cap < n:
            raise ValueError(f"capacity {cap} < point count {n}")
        pad = cap - n

        def _pad(a, fill=0.0):
            if pad == 0:
                return a
            shape = (pad,) + a.shape[1:]
            return np.concatenate([a, np.full(shape, fill, a.dtype)], axis=0)

        return PointCloud(
            xyz=jnp.asarray(_pad(xyz)),
            normal=jnp.asarray(_pad(normal)),
            tangent=jnp.asarray(_pad(tangent)),
            valid=jnp.asarray(_pad(valid, False)),
        )


def finite_filter(cloud: PointCloud) -> PointCloud:
    """Invalidate points with non-finite position/normal/tangent.

    Mirrors the subset finite-filter at /root/reference/include/impl/model.hpp:24-30.

    Non-finite rows are also ZEROED, not just masked: downstream ops mask
    invalid points arithmetically (``d2 + inf_penalty``, ``score * w``),
    and NaN defeats both (``NaN + inf = NaN``, ``NaN * 0 = NaN``).  With
    the coordinates sanitized here, every masking idiom in the package is
    NaN-safe without per-op special cases (invalid rows' values carry no
    meaning — padding rows are already 0).
    """
    finite = (
        jnp.all(jnp.isfinite(cloud.xyz), axis=-1)
        & jnp.all(jnp.isfinite(cloud.normal), axis=-1)
        & jnp.all(jnp.isfinite(cloud.tangent), axis=-1)
    )
    f = finite[:, None]
    return dataclasses.replace(
        cloud,
        xyz=jnp.where(f, cloud.xyz, 0.0),
        normal=jnp.where(f, cloud.normal, 0.0),
        tangent=jnp.where(f, cloud.tangent, 0.0),
        valid=cloud.valid & finite,
    )


def bbox(cloud: PointCloud) -> tuple[jax.Array, jax.Array]:
    """Axis-aligned bounding box (lower, upper) over valid points."""
    big = jnp.float32(jnp.inf)
    v = cloud.valid[:, None]
    lower = jnp.min(jnp.where(v, cloud.xyz, big), axis=0)
    upper = jnp.max(jnp.where(v, cloud.xyz, -big), axis=0)
    return lower, upper


def diameter(cloud: PointCloud) -> jax.Array:
    """Bounding-box diagonal length.

    Mirrors ``pointcloud::diameter`` (/root/reference/include/impl/pointcloud.hpp:84-97).
    """
    lower, upper = bbox(cloud)
    return jnp.linalg.norm(upper - lower)


def resolution(cloud: PointCloud, block: int = 1024) -> jax.Array:
    """Mean nearest-neighbor distance over valid points.

    Mirrors ``pointcloud::resolution`` (/root/reference/include/impl/pointcloud.hpp:66-82):
    the average over all points of the distance to the nearest *other* point.
    Computed with a tiled distance matmul instead of a kd-tree.
    """
    from triplet_match_tpu.ops.knn import nn1_exclusive_dist

    d = nn1_exclusive_dist(cloud, block=block)  # [N]
    w = cloud.valid.astype(jnp.float32)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)


def pad_capacity(cloud: PointCloud, multiple: int) -> PointCloud:
    """Pad the point capacity up to a multiple with invalid filler rows.

    Mesh-sharded searches require the capacity to be divisible by the sp
    axis extent (search/driver.py ``find_all``); this is the supported way
    to meet that for an already-built cloud.  No-op when already aligned.
    """
    cap = cloud.capacity
    new = -(-cap // max(multiple, 1)) * max(multiple, 1)
    if new == cap:
        return cloud
    pad = new - cap

    def _pad(a, fill):
        shape = (pad,) + a.shape[1:]
        return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)], axis=0)

    return PointCloud(
        xyz=_pad(cloud.xyz, 0.0),
        normal=_pad(cloud.normal, 0.0),
        tangent=_pad(cloud.tangent, 0.0),
        valid=_pad(cloud.valid, False),
    )


def transform_cloud(cloud: PointCloud, t: jax.Array) -> PointCloud:
    """Apply a rigid transform [4,4] to positions and rotate normal/tangent."""
    r = t[:3, :3]
    hi = jax.lax.Precision.HIGHEST
    xyz = jnp.matmul(cloud.xyz, r.T, precision=hi) + t[:3, 3]
    return dataclasses.replace(
        cloud,
        xyz=xyz,
        normal=jnp.matmul(cloud.normal, r.T, precision=hi),
        tangent=jnp.matmul(cloud.tangent, r.T, precision=hi),
    )
