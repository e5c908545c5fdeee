"""Pose scoring against the model voxel LUT (the ``project_`` hot loop).

Mirrors ``scene::project_`` (/root/reference/include/impl/scene.hpp:411-510):
push scene points through a candidate pose, look up the nearest model point
in the voxel LUT, gate on distance (thres = dist_thres * model resolution)
and tangent/normal *kind* agreement, and accumulate |ref . ref_n| orientation
scores plus correspondences.

The reference scores one pose at a time over a kd-tree radius neighborhood
with early-out/early-drop branching.  Here *all* H poses score in one
batched pass over fixed-size neighbor sets; early-out/early-drop become
"score everything, then top-k", which is what the TPU wants (SURVEY §7.6).
Hypothesis chunks are scanned with ``lax.map`` so peak memory is
``chunk * K`` regardless of H.

This is the jnp reference implementation; the fused Pallas kernel lives in
``score_pallas.py`` and is tested against this one.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_HI = jax.lax.Precision.HIGHEST  # pose-critical transforms must not drop to bf16 on TPU

from triplet_match_tpu.index.model import CompiledModel, voxel_query, voxel_query_exact


class ScoreResult(NamedTuple):
    score: jax.Array  # [...] float32 — signed orientation score (unnormalized)
    count: jax.Array  # [...] int32   — number of correspondences


def _score_points(model: CompiledModel, scene, tangent_mask, consumed,
                  ts, idx, idx_valid, thres, exact: bool = False,
                  weighted_distance: bool = False, negative_scores: bool = False,
                  samples_on_all: bool = True):
    """Score gathered scene points under poses.

    ts: [..., 4, 4]; idx/idx_valid: [..., K]; returns per-point contribution
    pieces reduced over K.  Shared by the hypothesis scorer and finish_find.

    ``weighted_distance`` applies the reference's Gaussian distance weight
    exp(-d^2 / (2*thres)) (impl/scene.hpp:430,468 — note the denominator is
    thres, not thres^2, faithfully preserved); ``negative_scores`` subtracts
    the weight when the nearest model point's tangent kind mismatches
    (impl/scene.hpp:473-475).  Both default off like the reference.
    ``samples_on_all=False`` restricts correspondence eligibility to
    tangent-bearing points (``considered_correspondence_``,
    impl/scene.hpp:534-536 — the gate is the raw tangent norm, not the full
    edge mask).
    """
    r = ts[..., :3, :3]
    pos = scene.xyz[idx]  # [..., K, 3]
    tpos = jnp.einsum("...ij,...kj->...ki", r, pos, precision=_HI) + ts[..., None, :3, 3]

    if exact:
        midx, inb = voxel_query_exact(model, tpos)  # [..., K]
    else:
        midx, inb = voxel_query(model, tpos)  # [..., K]
    mpos = model.cloud.xyz[midx]
    dist = jnp.linalg.norm(tpos - mpos, axis=-1)

    use_tangent = tangent_mask[idx]  # [..., K]
    ref = jnp.where(use_tangent[..., None], scene.tangent[idx], scene.normal[idx])
    tref = jnp.einsum("...ij,...kj->...ki", r, ref, precision=_HI)

    mtan = model.cloud.tangent[midx]
    is_tangent = jnp.linalg.norm(mtan, axis=-1) > 0.7
    ref_n = jnp.where(is_tangent[..., None], mtan, model.cloud.normal[midx])

    eligible = idx_valid & scene.valid[idx] & ~consumed[idx] & inb & (dist <= thres)
    if not samples_on_all:
        eligible = eligible & (jnp.linalg.norm(scene.tangent[idx], axis=-1) > 0.7)
    kind_ok = use_tangent == is_tangent
    ok = eligible & kind_ok

    if weighted_distance:
        weight = jnp.exp(-dist * dist / (2.0 * thres))
    else:
        weight = jnp.ones_like(dist)
    w = weight * jnp.abs(jnp.sum(tref * ref_n, axis=-1))
    score = jnp.sum(jnp.where(ok, w, 0.0), axis=-1)
    if negative_scores:
        score = score - jnp.sum(jnp.where(eligible & ~kind_ok, weight, 0.0), axis=-1)
    count = jnp.sum(ok.astype(jnp.int32), axis=-1)
    return score, count, ok, midx


def score_hypotheses(
    model: CompiledModel,
    scene,
    tangent_mask: jax.Array,
    consumed: jax.Array,
    ts: jax.Array,
    nbr_idx: jax.Array,
    nbr_valid: jax.Array,
    dist_thres,
    *,
    chunk: int = 2048,
) -> ScoreResult:
    """Score H pose hypotheses over their neighbor sets.

    Args:
      ts: [H, 4, 4] scene->model poses.
      nbr_idx / nbr_valid: [H, K] scene-point neighborhoods per hypothesis
        (the radius-search subset of impl/scene.hpp:273).
      dist_thres: in multiples of model resolution (impl/scene.hpp:413).

    Returns:
      ScoreResult([H] score, [H] count).
    """
    thres = jnp.float32(dist_thres) * model.resolution
    h = ts.shape[0]
    nchunks = -(-h // chunk)
    pad = nchunks * chunk - h
    ts_p = jnp.concatenate([ts, jnp.tile(jnp.eye(4)[None], (pad, 1, 1))]) if pad else ts
    ni_p = jnp.pad(nbr_idx, ((0, pad), (0, 0))) if pad else nbr_idx
    nv_p = jnp.pad(nbr_valid, ((0, pad), (0, 0))) if pad else nbr_valid

    def tile(args):
        tc, ic, vc = args
        s, c, _, _ = _score_points(model, scene, tangent_mask, consumed, tc, ic, vc, thres)
        return s, c

    s, c = lax.map(
        tile,
        (
            ts_p.reshape(nchunks, chunk, 4, 4),
            ni_p.reshape(nchunks, chunk, -1),
            nv_p.reshape(nchunks, chunk, -1),
        ),
    )
    return ScoreResult(s.reshape(-1)[:h], c.reshape(-1)[:h])


class DenseCorrs(NamedTuple):
    """Dense correspondence set from a full-cloud scoring pass.

    The reference returns growing vectors (scene_corrs, model_corrs); under
    static shapes each scene point either corresponds (valid=True, with its
    model index) or not.
    """

    model_idx: jax.Array  # [N] int32
    valid: jax.Array  # [N] bool
    score: jax.Array  # scalar float32 (unnormalized signed score)
    count: jax.Array  # scalar int32


def finish_find(model: CompiledModel, scene, tangent_mask, consumed, t, dist_thres,
                exact: bool = False, weighted_distance: bool = False,
                negative_scores: bool = False, samples_on_all: bool = True,
                axis_name: str | None = None) -> DenseCorrs:
    """Score one pose against ALL scene points -> dense correspondences.

    Analog of ``scene::finish_find`` (impl/scene.hpp:100-106): project_ over
    the full cloud, no early-out.  ``exact=True`` switches correspondences
    to LUT-seeded exact nearest neighbors (the ``naive_corrs`` analog).

    ``axis_name``: when the scene arrays are a shard of a mesh-sharded
    scene (inside shard_map), per-point outputs stay shard-local and the
    scalar score/count psum over that axis.
    """
    thres = jnp.float32(dist_thres) * model.resolution
    n = scene.xyz.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    score, count, ok, midx = _score_points(
        model, scene, tangent_mask, consumed, t, idx, jnp.ones(n, bool), thres,
        exact=exact, weighted_distance=weighted_distance, negative_scores=negative_scores,
        samples_on_all=samples_on_all,
    )
    if axis_name is not None:
        score = lax.psum(score, axis_name)
        count = lax.psum(count, axis_name)
    return DenseCorrs(model_idx=midx.astype(jnp.int32), valid=ok, score=score, count=count)


def normalize_score(model: CompiledModel, score):
    """score / model cloud size (impl/scene.hpp:406-409)."""
    return score / jnp.maximum(model.n_all.astype(jnp.float32), 1.0)


def get_bench_scorer(*, chunk: int = 8192):
    """Jitted scoring step used by bench.py and the Pallas parity tests."""

    @jax.jit
    def step(model, cloud, tangent_mask, consumed, ts, nbr_idx, nbr_valid, dist_thres):
        return score_hypotheses(
            model, cloud, tangent_mask, consumed, ts, nbr_idx, nbr_valid,
            dist_thres, chunk=chunk,
        )

    return step
