"""Batched nearest-neighbor ops (the kd-tree / octree replacement).

The reference answers every spatial query through a PCL kd-tree
(/root/reference/include/impl/pointcloud.hpp:116-210) or the (unused) octree
(/root/reference/include/octree).  On TPU both become one primitive: a tiled
squared-distance computation whose inner product rides the MXU
(``|q|^2 - 2 q.r + |r|^2``), followed by ``lax.top_k``.

Tiling is two-level so memory stays bounded for million-point clouds
(BASELINE configs 4-5): query blocks are mapped (``lax.map``) and reference
blocks are scanned (``lax.scan``) with a running top-k merge, so the peak
intermediate is ``block x ref_block`` floats regardless of Q and N.

The matmul expansion cancels catastrophically in f32 when coordinates are
large relative to distances, so selection runs in two stages: an approximate
top-(k + pad) via the expansion, then an exact ``sum((q-r)^2)`` re-rank over
just those candidates.  This keeps the FLOP-heavy stage on the MXU while
returning kd-tree-exact neighbors (up to genuine ties).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_INF = np.float32(3.0e38)
_REFINE_PAD = 8


def _pad_rows(a: jax.Array, to: int):
    pad = to - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)


def _default_ref_block(n: int, block: int) -> int:
    # bound the [block, ref_block] tile to ~64MB f32
    cap = max(4096, (1 << 24) // max(block, 1))
    return min(n, cap)


def pairwise_sqdist(q: jax.Array, r: jax.Array,
                    precision=jax.lax.Precision.HIGH) -> jax.Array:
    """Approximate squared distances [Q, N] via the matmul expansion.

    The cross-term matmul defaults to Precision.HIGH (3-pass bf16 on TPU,
    ~f32-equivalent mantissa): the TPU default single-pass bf16 introduces
    absolute d^2 errors of ~1e-1 at unit-scale coordinates, large enough to
    evict the true nearest neighbor from the candidate top-k entirely (the
    exact re-rank can only fix ordering *within* the candidates).  Callers
    should also center coordinates to keep magnitudes small.

    Callers that only need an approximate neighbor *set* (curvature
    statistics, scoring neighborhoods, sampling pools) may pass
    Precision.DEFAULT for ~3x less MXU work — a borderline neighbor
    swapping in or out of a set is harmless there, unlike a missed true
    nearest neighbor in a correspondence.
    """
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    rr = jnp.sum(r * r, axis=-1)
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32, precision=precision)
    return jnp.maximum(qq - 2.0 * cross + rr[None, :], 0.0)


def _scan_candidates(qb, r, inf_row, k2, ref_block, *, self_rows=None,
                     precision=jax.lax.Precision.HIGH):
    """Running top-k2 candidates of query block ``qb`` over scanned ref blocks.

    self_rows: optional [B] global query row ids to exclude (self-match).
    Returns (cand_idx [B, k2] int32, approx_d2 [B, k2]).
    """
    # center coordinates: the matmul-expansion error scales with |coord|^2,
    # and candidate selection must not lose the true NN to rounding.
    # VALIDITY-WEIGHTED mean — padded/invalid rows are zero-filled
    # (core/cloud.py) and would otherwise drag the center toward the
    # origin, leaving residual coordinates large on bucketed clouds
    w = (inf_row == 0.0).astype(r.dtype)
    center = jnp.sum(r * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    qb = qb - center
    r = r - center
    n = r.shape[0]
    nrb = -(-n // ref_block)
    r_p = _pad_rows(r, nrb * ref_block).reshape(nrb, ref_block, 3)
    inf_p = jnp.pad(inf_row, (0, nrb * ref_block - n), constant_values=_INF)
    inf_p = inf_p.reshape(nrb, ref_block)
    b = qb.shape[0]

    def body(carry, args):
        best_d2, best_idx = carry
        rb_i, r_b, inf_b = args
        d2 = pairwise_sqdist(qb, r_b, precision=precision) + inf_b[None, :]
        if self_rows is not None:
            col = rb_i * ref_block + jnp.arange(ref_block, dtype=jnp.int32)
            d2 = jnp.where(self_rows[:, None] == col[None, :], _INF, d2)
        kk = min(k2, ref_block)
        neg, idx = lax.top_k(-d2, kk)
        idx = idx + rb_i * ref_block
        cat_d2 = jnp.concatenate([best_d2, -neg], axis=1)
        cat_idx = jnp.concatenate([best_idx, idx.astype(jnp.int32)], axis=1)
        neg2, pos = lax.top_k(-cat_d2, k2)
        return (-neg2, jnp.take_along_axis(cat_idx, pos, axis=1)), None

    init = (jnp.full((b, k2), _INF), jnp.zeros((b, k2), jnp.int32))
    (d2, idx), _ = lax.scan(
        body, init, (jnp.arange(nrb, dtype=jnp.int32), r_p, inf_p)
    )
    return idx, d2


def knn(
    q: jax.Array,
    r: jax.Array,
    r_valid: jax.Array,
    k: int,
    *,
    block: int = 1024,
    ref_block: int | None = None,
    approx_candidates: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """k nearest reference points for each query point (exact distances).

    ``approx_candidates=True`` runs the candidate scan at DEFAULT matmul
    precision (~3x faster on TPU) — the returned distances stay exact, but
    a borderline candidate may be missed; use only where the neighbor SET
    is statistical (curvature, sampling pools), never for correspondences.

    Replaces ``pointcloud::knn_inclusive`` (/root/reference/include/impl/pointcloud.hpp:138-146).

    Args:
      q: [Q, 3] query positions.
      r: [N, 3] reference positions.
      r_valid: [N] bool reference validity.
      k: number of neighbors (static).
      block: query tile size; ref_block: reference tile size (auto).

    Returns:
      (indices [Q, k] int32, sqdists [Q, k] float32).  Invalid reference
      points never appear; if fewer than k valid points exist the tail
      entries carry huge sqdists.
    """
    qn = q.shape[0]
    n = r.shape[0]
    rb = ref_block or _default_ref_block(n, block)
    # >= k so the final top_k never exceeds the candidate width when the
    # reference capacity itself is below k (tails are masked to _INF below)
    k2 = max(min(k + _REFINE_PAD, n), k)
    nblocks = -(-qn // block)
    qp = _pad_rows(q, nblocks * block).reshape(nblocks, block, 3)
    inf_row = jnp.where(r_valid, 0.0, _INF)

    prec = jax.lax.Precision.DEFAULT if approx_candidates else jax.lax.Precision.HIGH

    def tile(qb):
        cand, cd2 = _scan_candidates(qb, r, inf_row, k2, rb, precision=prec)
        cpos = r[jnp.minimum(cand, n - 1)]
        d2 = jnp.sum(jnp.square(cpos - qb[:, None, :]), axis=-1)
        # candidate slots the scan never filled (fewer than k2 valid points:
        # init idx 0 / padded rows / invalid refs) carry >=_INF approx
        # distances — without this mask they would earn finite exact
        # distances and evict real neighbors as duplicates of point 0
        d2 = jnp.where(cd2 >= _INF, _INF, d2)
        neg, pos = lax.top_k(-d2, k)
        idx = jnp.take_along_axis(cand, pos, axis=1)
        return idx.astype(jnp.int32), -neg

    idx, d2 = lax.map(tile, qp)
    return idx.reshape(-1, k)[:qn], d2.reshape(-1, k)[:qn]


def nn1(q: jax.Array, r: jax.Array, r_valid: jax.Array, *, block: int = 2048,
        ref_block: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Single nearest neighbor (argmin) — the voxel-LUT build primitive.

    Replaces the per-voxel ``knn_inclusive(1, center)`` loop at
    /root/reference/include/impl/model.hpp:81-94.
    """
    qn = q.shape[0]
    n = r.shape[0]
    rb = ref_block or _default_ref_block(n, block)
    k2 = min(1 + _REFINE_PAD, n)
    nblocks = -(-qn // block)
    qp = _pad_rows(q, nblocks * block).reshape(nblocks, block, 3)
    inf_row = jnp.where(r_valid, 0.0, _INF)

    def tile(qb):
        cand, cd2 = _scan_candidates(qb, r, inf_row, k2, rb)
        cpos = r[jnp.minimum(cand, n - 1)]
        d2 = jnp.sum(jnp.square(cpos - qb[:, None, :]), axis=-1)
        d2 = jnp.where(cd2 >= _INF, _INF, d2)  # unfilled/invalid slots
        j = jnp.argmin(d2, axis=-1)
        idx = jnp.take_along_axis(cand, j[:, None], axis=1)[:, 0]
        return idx.astype(jnp.int32), jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]

    idx, d2 = lax.map(tile, qp)
    return idx.reshape(-1)[:qn], d2.reshape(-1)[:qn]


def nn1_exclusive_dist(cloud, *, block: int = 1024, ref_block: int | None = None) -> jax.Array:
    """Distance from each valid point to its nearest *other* valid point.

    The ``resolution()`` primitive (/root/reference/include/impl/pointcloud.hpp:66-82).
    Self-matches are excluded by masking the point's own index.
    """
    xyz, valid = cloud.xyz, cloud.valid
    n = xyz.shape[0]
    rb = ref_block or _default_ref_block(n, block)
    k2 = min(2 + _REFINE_PAD, n)
    nblocks = -(-n // block)
    xp = _pad_rows(xyz, nblocks * block).reshape(nblocks, block, 3)
    inf_row = jnp.where(valid, 0.0, _INF)

    def tile(args):
        bi, qb = args
        rows = bi * block + jnp.arange(block, dtype=jnp.int32)
        cand, cd2 = _scan_candidates(qb, xyz, inf_row, k2, rb, self_rows=rows)
        cpos = xyz[jnp.minimum(cand, n - 1)]
        d2 = jnp.sum(jnp.square(cpos - qb[:, None, :]), axis=-1)
        d2 = jnp.where(cd2 >= _INF, _INF, d2)  # unfilled/invalid slots
        d2 = jnp.where(cand == rows[:, None], _INF, d2)
        return jnp.min(d2, axis=-1)

    d2 = lax.map(tile, (jnp.arange(nblocks, dtype=jnp.int32), xp)).reshape(-1)[:n]
    return jnp.where(valid, jnp.sqrt(d2), 0.0)


def radius_sample(
    key,
    q: jax.Array,
    r: jax.Array,
    r_valid: jax.Array,
    radius,
    k: int,
    *,
    block: int = 256,
    ref_block: int | None = None,
    prio: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Uniform random sample of up to ``k`` in-radius points per query.

    The nearest-k ball truncation (radius_neighbors) silently biases dense
    scenes: when the ball holds many more than k points, the nearest-k
    subset concentrates around the query, where competing pose hypotheses
    are least distinguishable (they all match near their anchor pair).  The
    reference scans the ENTIRE ball in shuffled order
    (impl/scene.hpp:273,284-288, 432), so its counts integrate over the
    whole ball.  Sampling k ball members uniformly (per-point random
    priorities, top-k by priority among in-radius points) is the unbiased
    fixed-size estimator of the full-ball count.

    When the ball holds <= k points this returns exactly the ball
    (priority order), so sparse scenes are unaffected.

    ``prio`` (optional [N]) supplies the per-point priorities explicitly —
    pass shard-invariant hash priorities (sampling.hash_uniform over global
    indices) when the reference set is a shard of a mesh-sharded scene, so
    every layout samples identically; ``key`` is ignored then.

    Returns (indices [Q, k] int32, mask [Q, k] bool).
    """
    qn = q.shape[0]
    n = r.shape[0]
    # top_k cost over a [block, rb] tile is superlinear in rb: chunking the
    # scan at ~32k columns and merging beats one wide selection (measured on
    # v5e at k=512 over 131k: rb=16384 is 2.2x faster than rb=65536; the
    # merge overhead wins below ~16*k).  Chunked top-k selection is exact,
    # so this is shape-only — results are identical for any rb.
    rb = ref_block or min(_default_ref_block(n, block), max(8192, 32 * k))
    nblocks = -(-qn // block)
    qp = _pad_rows(q, nblocks * block).reshape(nblocks, block, 3)
    rad2 = jnp.asarray(radius, jnp.float32) ** 2
    # per-point uniform priorities; invalid points get +inf
    if prio is None:
        prio = jax.random.uniform(key, (n,))
    prio = jnp.where(r_valid, prio, _INF)
    nrb = -(-n // rb)
    r_p = _pad_rows(r, nrb * rb).reshape(nrb, rb, 3)
    prio_p = jnp.pad(prio, (0, nrb * rb - n), constant_values=_INF).reshape(nrb, rb)

    # validity-weighted center (zero-filled padding rows must not shift it)
    wv = r_valid.astype(r.dtype)
    center = jnp.sum(r * wv[:, None], axis=0) / jnp.maximum(jnp.sum(wv), 1.0)

    def tile(qb):
        qb = qb - center

        def body(carry, args):
            best_p, best_idx = carry
            rb_i, r_b, p_b = args
            d2 = pairwise_sqdist(qb, r_b - center, precision=lax.Precision.DEFAULT)
            sel = jnp.where(d2 <= rad2, p_b[None, :], _INF)
            kk = min(k, rb)
            neg, idx = lax.top_k(-sel, kk)
            idx = idx + rb_i * rb
            cat_p = jnp.concatenate([best_p, -neg], axis=1)
            cat_i = jnp.concatenate([best_idx, idx.astype(jnp.int32)], axis=1)
            neg2, pos = lax.top_k(-cat_p, k)
            return (-neg2, jnp.take_along_axis(cat_i, pos, axis=1)), None

        init = (jnp.full((block, k), _INF), jnp.zeros((block, k), jnp.int32))
        (p_best, i_best), _ = lax.scan(
            body, init, (jnp.arange(nrb, dtype=jnp.int32), r_p, prio_p)
        )
        return i_best, p_best < _INF

    idx, mask = lax.map(tile, qp)
    return idx.reshape(-1, k)[:qn], mask.reshape(-1, k)[:qn]


def radius_neighbors(
    q: jax.Array,
    r: jax.Array,
    r_valid: jax.Array,
    radius,
    k: int,
    *,
    block: int = 256,
    ref_block: int | None = None,
    approx_candidates: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Up to ``k`` nearest neighbors within ``radius`` (pad-and-mask).

    Replaces ``pointcloud::radius_search_inclusive``
    (/root/reference/include/impl/pointcloud.hpp:169-177) under the static-shape
    regime: the dynamic result list becomes the k nearest with an in-radius mask.

    Returns:
      (indices [Q, k] int32, mask [Q, k] bool).
    """
    idx, d2 = knn(q, r, r_valid, k, block=block, ref_block=ref_block,
                  approx_candidates=approx_candidates)
    return idx, d2 <= jnp.asarray(radius, jnp.float32) ** 2
