"""Grid-bucketed nearest neighbors (the spatial-locality analog of the
reference's kd-tree, /root/reference/include/impl/pointcloud.hpp:116-210).

The brute-force MXU kNN in ``ops/knn.py`` is exact but O(Q*N) — at 1M scene
points the curvature pass alone costs minutes.  This op restores the
kd-tree's O(Q * local density) by hashing points into a uniform grid:

* points get packed 30-bit cell ids (10 bits/axis, so the grid tops out at
  1024^3); ids are sorted once (``lax.sort``), giving contiguous cell runs;
* a query gathers candidates from its 27-cell stencil via ``searchsorted``
  into the sorted id array (no per-cell tables, no scatter, all static
  shapes);
* exact f32 distances on the gathered candidates -> ``top_k``.

Unlike the matmul-expansion kNN, distances here are direct ``(q-r)^2``
differences, so there is no catastrophic cancellation at large coordinate
magnitudes — neighborhoods in million-point unit-scale scenes come out
exact as long as the true neighbors lie within the one-ring stencil
(cell_size >= the k-NN radius of interest).

Approximation contract: neighbors farther than one cell ring are never
found, and cells holding more than ``cap`` points contribute only their
first ``cap`` (in sorted order).  Choose ``cell_size`` at or above the
typical k-NN radius (see ``estimate_knn_radius``) and ``cap`` a few times
the expected per-cell occupancy.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_SENTINEL = np.int32(0x7FFFFFFF)  # sorts after every packed cell id
_INF = np.float32(3.0e38)


class GridIndex(NamedTuple):
    """Sorted-cell-id spatial index over a fixed point set."""

    sids: jax.Array  # [N] int32 sorted packed cell ids (invalid -> sentinel)
    order: jax.Array  # [N] int32 point index per sorted slot
    lo: jax.Array  # [3] grid origin
    inv_cell: jax.Array  # [3] 1/cell edge per axis
    dims: jax.Array  # [3] int32 cells per axis (each <= 1024)


def _cell_coords(xyz: jax.Array, lo, inv_cell, dims) -> jax.Array:
    c = jnp.floor((xyz - lo) * inv_cell).astype(jnp.int32)
    return jnp.clip(c, 0, dims - 1)


def _pack(c: jax.Array) -> jax.Array:
    return c[..., 0] | (c[..., 1] << 10) | (c[..., 2] << 20)


def build_grid(xyz: jax.Array, valid: jax.Array, cell_size) -> GridIndex:
    """Index ``xyz`` (with validity mask) at ``cell_size`` (traced scalar ok)."""
    lo = jnp.min(jnp.where(valid[:, None], xyz, _INF), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], xyz, -_INF), axis=0)
    ext = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.maximum(jnp.asarray(cell_size, jnp.float32), 1e-6)
    # floor, not ceil: the effective edge ext/dims must be >= cell_size or
    # the one-ring stencil misses true neighbors at distances in
    # (edge, cell_size].  dims=1 (ext < cell_size) is still exact — the
    # stencil then spans the whole axis.
    dims = jnp.clip(jnp.floor(ext / cell).astype(jnp.int32), 1, 1024)
    inv_cell = dims.astype(jnp.float32) / ext

    ids = _pack(_cell_coords(xyz, lo, inv_cell, dims))
    ids = jnp.where(valid, ids, _SENTINEL)
    n = xyz.shape[0]
    sids, order = lax.sort((ids, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    return GridIndex(sids=sids, order=order, lo=lo, inv_cell=inv_cell, dims=dims)


def grid_neighbors(
    grid: GridIndex,
    r_xyz: jax.Array,
    q_xyz: jax.Array,
    k: int,
    *,
    cap: int = 64,
    radius=None,
) -> tuple[jax.Array, jax.Array]:
    """Up to ``k`` nearest indexed points per query from the 27-cell stencil.

    Args:
      grid: index from :func:`build_grid` over ``r_xyz``.
      r_xyz: [N, 3] the indexed points (same array the grid was built on).
      q_xyz: [B, 3] query positions.
      k: neighbors returned (static).
      cap: candidates consumed per stencil cell (static).
      radius: optional distance bound; neighbors beyond it are masked out.

    Returns:
      (idx [B, k] int32, mask [B, k] bool).  ``mask`` marks real neighbors
      (valid candidate, within radius if given); masked slots carry
      arbitrary indices.
    """
    b = q_xyz.shape[0]
    qc = _cell_coords(q_xyz, grid.lo, grid.inv_cell, grid.dims)  # [B, 3]

    # 27-cell stencil, out-of-range cells masked
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), axis=-1
    ).reshape(27, 3)
    cells = qc[:, None, :] + offs[None, :, :]  # [B, 27, 3]
    in_range = jnp.all((cells >= 0) & (cells < grid.dims), axis=-1)  # [B, 27]
    cids = jnp.where(in_range, _pack(jnp.clip(cells, 0, grid.dims - 1)), _SENTINEL)

    start = jnp.searchsorted(grid.sids, cids.reshape(-1), side="left").reshape(b, 27)
    end = jnp.searchsorted(grid.sids, cids.reshape(-1), side="right").reshape(b, 27)

    # cells fuller than cap contribute an even-strided subsample (not the
    # sorted-order prefix, which is index-biased)
    count = end - start  # [B, 27]
    offs27 = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.where(
        count[..., None] <= cap,
        offs27,
        (offs27 * count[..., None]) // cap,
    )
    slots = start[..., None] + pos  # [B, 27, cap]
    cand_ok = in_range[..., None] & (offs27 < count[..., None])
    n = grid.sids.shape[0]
    cand = grid.order[jnp.minimum(slots, n - 1)].reshape(b, 27 * cap)
    cand_ok = cand_ok.reshape(b, 27 * cap)

    diff = r_xyz[cand] - q_xyz[:, None, :]  # [B, 27*cap, 3] exact f32
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_ok, d2, _INF)

    neg, pos = lax.top_k(-d2, k)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    d2k = -neg
    mask = d2k < _INF
    if radius is not None:
        mask = mask & (d2k <= jnp.asarray(radius, jnp.float32) ** 2)
    return idx, mask


def estimate_knn_radius(
    xyz: jax.Array,
    valid: jax.Array,
    k: int,
    *,
    n_sample: int = 2048,
    quantile: float = 0.9,
    focus: jax.Array | None = None,
    min_focus: int = 64,
) -> jax.Array:
    """Typical k-NN radius from a strided subsample (sizes the grid cell).

    Uses the exact brute kNN on ``n_sample`` strided queries against the
    full cloud, returning the ``quantile`` of the k-th neighbor distances —
    at the 0.9 default the one-ring stencil contains the true k
    neighborhood for ~90% of points, and denser regions (smaller radii) are
    always covered.

    ``focus`` (optional [N] bool) restricts the statistic to the points
    whose neighborhoods actually matter (e.g. tangent-bearing edge
    candidates): in mixed-density scenes the global quantile is dominated
    by the majority population, mis-sizing cells for the minority.  Falls
    back to the global estimate when fewer than ``min_focus`` focus points
    land in the subsample.
    """
    from triplet_match_tpu.ops.knn import knn

    n = xyz.shape[0]
    # ceil division so the stride spans the WHOLE cloud: floor would sample
    # only the prefix (one spatial region of a scan-ordered cloud) whenever
    # n_sample < n < 2*n_sample, biasing the radius to that region's density
    step = max(-(-n // n_sample), 1)
    sub_idx = jnp.arange(0, n, step, dtype=jnp.int32)[:n_sample]
    q = xyz[sub_idx]
    _, d2 = knn(q, xyz, valid, k, block=min(n_sample, 512))
    dk = jnp.sqrt(jnp.maximum(d2[:, -1], 0.0))
    ok = valid[sub_idx] & (d2[:, -1] < _INF)
    r_all = jnp.nanquantile(jnp.where(ok, dk, jnp.nan), quantile)
    # no sampled query has k valid neighbors (cloud smaller than k, or a
    # consumed-out shard): nanquantile of all-NaN is NaN, which would
    # poison build_grid's cell size into garbage dims with no error —
    # fall back to the bounding-box diagonal (one cell spans everything,
    # which is exact for such tiny populations)
    bbox = jnp.linalg.norm(
        jnp.max(jnp.where(valid[:, None], xyz, -_INF), axis=0)
        - jnp.min(jnp.where(valid[:, None], xyz, _INF), axis=0))
    fallback = jnp.maximum(bbox, 1e-6)
    r_all = jnp.where(jnp.isfinite(r_all), r_all, fallback)
    if focus is None:
        return r_all
    f = ok & focus[sub_idx]
    r_focus = jnp.nanquantile(jnp.where(f, dk, jnp.nan), quantile)
    use_focus = jnp.sum(f.astype(jnp.int32)) >= min_focus
    return jnp.where(use_focus & jnp.isfinite(r_focus), r_focus, r_all)
