"""Multi-instance search driver (``find_all_parallel`` analog).

Mirrors the control flow of /root/reference/include/impl/scene.hpp:39-240:

  prepare scene (curvature -> edge mask)                 impl/scene.hpp:41-58
  WHILE matches found:                                   impl/scene.hpp:70-95
    sample first/second pairs, query model,              impl/scene.hpp:242-353
    pose hypotheses (base_transform) + force_up gate,    impl/scene.hpp:315-319
    score hypotheses (project_),                         impl/scene.hpp:326
    promote finalists -> finish_find -> ICP,             impl/scene.hpp:361-366,171
    sort by corr count, greedy non-overlap acceptance,   impl/scene.hpp:193-237
    mask accepted scene points.                          impl/scene.hpp:87-93

The reference fans the outer loop across ``std::async`` threads with
mutex-guarded masks; here each round is ONE jitted program over a hypothesis
batch ([B1, B2, Q] poses scored at once), and the only sequential state is
the deterministic mask update between rounds.  Early-out / early-drop
(impl/scene.hpp:330-347, 492-506) are subsumed by exhaustive batched scoring
+ top-k, which is the TPU-shaped equivalent.
"""

from __future__ import annotations

import dataclasses
import math
import time
import weakref
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from triplet_match_tpu.config import (
    DEFAULT_DISCRETIZATION,
    DEFAULT_POLICY,
    DEFAULT_SAMPLE_PARAMS,
    DiscretizationParams,
    SampleParams,
    SearchPolicy,
)
from triplet_match_tpu.core import cloud as cl
from triplet_match_tpu.core.transforms import base_transform, invert_rigid
from triplet_match_tpu.features import pairfeat as pf
from triplet_match_tpu.index.model import CompiledModel, query_pairs
from triplet_match_tpu.ops.curvature import (
    curvature_from_neighbors,
    curvature_ratio,
    edge_mask as edge_mask_op,
    principal_curvatures,
)
from triplet_match_tpu.ops.knn import radius_sample
from triplet_match_tpu.refine.icp import icp_refine
from triplet_match_tpu.search.sampling import hash_uniform, sample_firsts, sample_seconds
from triplet_match_tpu.search.score import _score_points, normalize_score


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cloud", "tangent_mask", "n_edge"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ScenePrep:
    """Per-scene preprocessing (impl/scene.hpp:41-58)."""

    cloud: cl.PointCloud
    tangent_mask: jax.Array  # [N] bool — edge points
    n_edge: jax.Array


@partial(jax.jit, static_argnames=("policy",))
def _prepare_scene_whole(cloud: cl.PointCloud, policy: SearchPolicy) -> ScenePrep:
    cloud = cl.finite_filter(cloud)
    curv = principal_curvatures(cloud, k=policy.curvature_k)
    tm = edge_mask_op(
        cloud,
        curv,
        tangent_norm_threshold=policy.tangent_norm_threshold,
        curvature_ratio_threshold=policy.curvature_ratio_threshold,
    )
    return ScenePrep(cloud=cloud, tangent_mask=tm, n_edge=jnp.sum(tm.astype(jnp.int32)))


@partial(jax.jit, static_argnames=("policy", "chunk", "cap"))
def _grid_edge_ratios(cloud: cl.PointCloud, qidx: jax.Array, *,
                      policy: SearchPolicy, chunk: int, cap: int) -> jax.Array:
    """Curvature ratios for the query subset ``qidx`` via the grid index.

    Cells are sized for the tangent-bearing population: only their
    curvature ratios reach the edge mask (the tangent-norm gate filters
    everything else), and in mixed-density scenes the global radius
    statistic mis-sizes their cells.
    """
    from triplet_match_tpu.ops import gridnn

    tangent_bearing = cloud.valid & (
        jnp.linalg.norm(cloud.tangent, axis=-1) > policy.tangent_norm_threshold
    )
    cell = gridnn.estimate_knn_radius(
        cloud.xyz, cloud.valid, policy.curvature_k, focus=tangent_bearing
    )
    grid = gridnn.build_grid(cloud.xyz, cloud.valid, cell)

    qx = cloud.xyz[qidx].reshape(-1, chunk, 3)
    qn = cloud.normal[qidx].reshape(-1, chunk, 3)

    def tile(args):
        x, nq = args
        idx, mask = gridnn.grid_neighbors(grid, cloud.xyz, x, policy.curvature_k, cap=cap)
        c = curvature_from_neighbors(nq, cloud.normal[idx], mask)
        return curvature_ratio(c)

    return jax.lax.map(tile, (qx, qn)).reshape(-1)


@partial(jax.jit, static_argnames=("policy", "chunk", "cap", "mesh"))
def _grid_edge_ratios_mesh(cloud: cl.PointCloud, qidx: jax.Array, *,
                           policy: SearchPolicy, chunk: int, cap: int,
                           mesh) -> jax.Array:
    """Mesh-sharded variant of :func:`_grid_edge_ratios`.

    The query tiles shard jointly over ALL mesh axes (pure data
    parallelism — each device sweeps its own tile stack against the
    replicated grid), so a scene whose edge-candidate pass would not fit
    one host's patience spreads across every chip.  The result is gathered
    back replicated so every process of a multi-controller runtime reads
    the same ratios (parallel/distributed.py conventions).

    Jitted at module level (mesh/policy are hashable statics) so repeated
    mesh-sharded ``prepare_scene`` calls at one shape reuse the compiled
    program instead of retracing a fresh closure per call.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from triplet_match_tpu.ops import gridnn

    ndev = math.prod(mesh.shape.values())
    all_axes = tuple(mesh.axis_names)
    joint = P(all_axes)  # dim 0 sharded over every axis jointly

    tangent_bearing = cloud.valid & (
        jnp.linalg.norm(cloud.tangent, axis=-1) > policy.tangent_norm_threshold
    )
    cell = gridnn.estimate_knn_radius(
        cloud.xyz, cloud.valid, policy.curvature_k, focus=tangent_bearing
    )
    grid = gridnn.build_grid(cloud.xyz, cloud.valid, cell)
    qx = cloud.xyz[qidx].reshape(ndev, -1, chunk, 3)
    qn = cloud.normal[qidx].reshape(ndev, -1, chunk, 3)

    def per_device(grid, xyz, normal, qx_d, qn_d):
        def tile(args):
            x, nq = args
            idx, mask = gridnn.grid_neighbors(grid, xyz, x, policy.curvature_k, cap=cap)
            c = curvature_from_neighbors(nq, normal[idx], mask)
            return curvature_ratio(c)

        return jax.lax.map(tile, (qx_d[0], qn_d[0]))[None]

    out = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), joint, joint),
        out_specs=joint, check_vma=False,
    )(grid, cloud.xyz, cloud.normal, qx, qn)
    # gather replicated so every controller reads identical ratios
    return jax.lax.with_sharding_constraint(
        out.reshape(-1), NamedSharding(mesh, P())
    )


def _prepare_scene_grid(cloud: cl.PointCloud, *, policy: SearchPolicy,
                        chunk: int = 4096, cap: int = 64, mesh=None) -> ScenePrep:
    """Grid-bucketed edge classification for large scenes.

    The brute-force pass is O(N^2/block) matmuls — minutes at 1M points —
    and its bf16 candidate selection degrades in dense unit-scale scenes
    (absolute d^2 error ~1e-1 vs neighbor gaps of ~1e-4).  This path is the
    kd-tree locality the reference gets from PCL
    (impl/pointcloud.hpp:138-198), with two structural wins:

    * neighbors come from a 27-cell grid stencil with exact f32 local
      distances (ops/gridnn.py) — O(N * local density), no matmul
      cancellation;
    * curvature is evaluated ONLY for tangent-bearing points — the edge
      mask is ``tnorm > 0.7 AND ratio < 0.2`` (impl/scene.hpp:50), so
      everything else is classified by the tangent gate alone.  In scanner
      data edge candidates are a small fraction of the cloud, collapsing
      the pass from N queries to #candidates.
    """
    cloud = jax.jit(cl.finite_filter)(cloud)
    n = cloud.xyz.shape[0]
    tb = np.asarray(cloud.valid) & (
        np.linalg.norm(np.asarray(cloud.tangent), axis=-1)
        > policy.tangent_norm_threshold
    )
    qidx = np.where(tb)[0].astype(np.int32)
    tm_np = np.zeros(n, bool)
    if qidx.size:
        c = min(chunk, max(-(-qidx.size // 256) * 256, 256))
        stride = c
        if mesh is not None:
            stride = c * math.prod(mesh.shape.values())
        qp = -(-qidx.size // stride) * stride
        qidx_p = np.zeros(qp, np.int32)
        qidx_p[: qidx.size] = qidx
        if mesh is not None:
            ratios = np.asarray(
                _grid_edge_ratios_mesh(cloud, jnp.asarray(qidx_p), policy=policy,
                                       chunk=c, cap=cap, mesh=mesh)
            )[: qidx.size]
        else:
            ratios = np.asarray(
                _grid_edge_ratios(cloud, jnp.asarray(qidx_p), policy=policy,
                                  chunk=c, cap=cap)
            )[: qidx.size]
        tm_np[qidx] = ratios < policy.curvature_ratio_threshold
    tm = jnp.asarray(tm_np) & cloud.valid
    return ScenePrep(cloud=cloud, tangent_mask=tm, n_edge=jnp.sum(tm.astype(jnp.int32)))


def prepare_scene(cloud: cl.PointCloud, policy: SearchPolicy = DEFAULT_POLICY,
                  *, grid_threshold: int = 32768, mesh=None) -> ScenePrep:
    """Per-scene preprocessing (impl/scene.hpp:41-58).

    Scenes above ``grid_threshold`` points use the grid-bucketed neighbor
    pass (O(#edge-candidates * local density), exact local f32 distances);
    smaller scenes run the brute-force MXU pass.  The threshold sits where
    the brute pass's approximate (bf16) candidate selection starts losing
    true neighbors in dense unit-scale scenes AND the grid pass is already
    much faster.

    ``mesh``: optional ``jax.sharding.Mesh`` — shards the grid pass's query
    tiles over every device of the mesh (multi-chip / multi-host scene
    preparation; see parallel/distributed.py).  ``cloud`` must hold full
    process-local arrays (replicated); the returned prep is replicated too
    and is sharded for the search by the caller (driver.find_all for
    single-controller meshes, make_global_cloud for multi-controller).
    """
    n = cloud.xyz.shape[0]
    if n <= grid_threshold and mesh is None:
        return _prepare_scene_whole(cloud, policy)
    return _prepare_scene_grid(cloud, policy=policy, mesh=mesh)


class RoundResult(NamedTuple):
    transform: jax.Array  # [F, 4, 4] scene->model (pre-inversion)
    accept: jax.Array  # [F] bool
    new_corr: jax.Array  # [F, N] bool — newly claimed scene corrs (isres)
    model_idx: jax.Array  # [F, N] int32
    count: jax.Array  # [F] int32 total corrs from ICP finish_find
    score: jax.Array  # [F] float32 signed score (unnormalized)
    hypotheses_scored: jax.Array  # int32 diagnostics
    # worst per-finalist candidate overflow of the subset join (0 = exact
    # or subset path off; see policy.join_subset_capacity)
    join_overflow: jax.Array = np.int32(0)


def hypothesize_and_score(
    model: CompiledModel,
    prep: ScenePrep,
    consumed: jax.Array,
    fp_mask: jax.Array,
    key: jax.Array,
    dist_thres,
    mpack=None,  # score_pallas.ModelPack, built OUTSIDE jit (host compaction)
    *,
    discretization: DiscretizationParams,
    sample_params: SampleParams,
    policy: SearchPolicy,
):
    """Sample pairs, query the model, build and score pose hypotheses.

    The per-worker body of the search (the reference's ``find_in_subset``,
    impl/scene.hpp:242-367).  Returns (ts_flat [H,4,4], scores [H],
    first_idx [B1], first_valid [B1], n_hypotheses).  Pure function of the
    PRNG key — the data-parallel path runs it per device with folded keys.
    """
    cloud = prep.cloud
    b1, b2 = policy.num_first_samples, policy.num_second_samples
    qcap = policy.query_cap
    ks = policy.score_neighbors

    lower = model.diameter * sample_params.min_diameter_factor
    upper = model.diameter * sample_params.max_diameter_factor
    thres = jnp.float32(dist_thres) * model.resolution

    k1, k2, k3, k4 = jax.random.split(key, 4)

    # --- sampling (impl/scene.hpp:131-166, 266-297) ---
    eligible_first = prep.tangent_mask & ~consumed & ~fp_mask & cloud.valid
    firsts = sample_firsts(k1, eligible_first, b1)
    # scoring neighborhood: a UNIFORM sample of the diameter ball (any point
    # kind — the project_ subset, impl/scene.hpp:273,432).  Nearest-K would
    # silently truncate dense balls to the region around the first point,
    # where competing hypotheses are least distinguishable (see
    # ops.knn.radius_sample); balls smaller than K are returned whole.
    gidx = jnp.arange(cloud.xyz.shape[0], dtype=jnp.int32)
    nbr_idx, nbr_in_r = radius_sample(
        k3, cloud.xyz[firsts.idx], cloud.xyz, cloud.valid, model.diameter, ks,
        block=min(b1, 256), prio=hash_uniform(k3, gidx),
    )
    # second-sample pool: EDGE points within the model diameter, uniformly
    # sampled — the reference walks the ball in shuffled order and skips
    # non-edge points (impl/scene.hpp:284-290), i.e. uniform over ball edges.
    second_eligible = prep.tangent_mask & ~consumed & cloud.valid
    pool_idx, pool_in_r = radius_sample(
        k4, cloud.xyz[firsts.idx], cloud.xyz, second_eligible, model.diameter,
        policy.second_pool, block=min(b1, 256), prio=hash_uniform(k4, gidx),
    )
    seconds = sample_seconds(k2, firsts, pool_idx, pool_in_r, second_eligible, b2)

    p0 = cloud.xyz[firsts.idx][:, None, :]  # [B1, 1, 3]
    t0 = cloud.tangent[firsts.idx][:, None, :]
    p1 = cloud.xyz[seconds.idx]  # [B1, B2, 3]
    t1 = cloud.tangent[seconds.idx]

    gates = pf.pair_gates(p0, p1, t0, lower, upper, policy.pair_parallel_epsilon)
    feats = pf.pair_feature(p0, p1, t0, t1)  # [B1, B2, 4]
    fval = pf.feature_valid(feats, model.bounds_min, model.bounds_max)
    pair_ok = seconds.valid & gates & fval

    # --- model query -> hypotheses (impl/scene.hpp:304-319) ---
    mpairs, mvalid = query_pairs(
        model, feats, discretization, qcap, limit=policy.query_limit
    )  # [B1,B2,Q,2]
    m_i, m_j = mpairs[..., 0], mpairs[..., 1]
    hyp_ok = pair_ok[..., None] & mvalid

    ts = base_transform(
        jnp.broadcast_to(p0[:, :, None, :], (b1, b2, qcap, 3)),
        jnp.broadcast_to(p1[:, :, None, :], (b1, b2, qcap, 3)),
        jnp.broadcast_to(t0[:, :, None, :], (b1, b2, qcap, 3)),
        model.cloud.xyz[m_i],
        model.cloud.xyz[m_j],
        model.cloud.tangent[m_i],
    )  # [B1, B2, Q, 4, 4]
    if sample_params.force_up:
        hyp_ok = hyp_ok & (jnp.abs(1.0 - ts[..., 2, 2]) <= 0.01)

    # --- batched project_ scoring ---
    if mpack is not None:
        # fused MXU kernel: exact-NN count ranking (score_pallas.py)
        from triplet_match_tpu.search import score_pallas as sp

        groups = sp.pack_groups(cloud, prep.tangent_mask, consumed, nbr_idx, nbr_in_r,
                                samples_on_all=_rank_on_all(policy))
        rows = sp.poses_to_rows(ts.reshape(b1, b2 * qcap, 4, 4))
        scores = sp.rank_groups(
            mpack, groups, rows, thres * thres,
            hyp_ok.reshape(b1, b2 * qcap), policy,
        ).reshape(-1)
    else:
        def per_first(args):
            ts_b, ok_b, nbrs, nbr_ok = args  # [B2*Q,4,4], [B2*Q], [Ks], [Ks]
            idx = jnp.broadcast_to(nbrs[None, :], (b2 * qcap, ks))
            iv = jnp.broadcast_to(nbr_ok[None, :], (b2 * qcap, ks))
            s, c, _, _ = _score_points(
                model, cloud, prep.tangent_mask, consumed, ts_b, idx, iv, thres,
                weighted_distance=policy.weighted_distance,
                negative_scores=policy.negative_scores,
                samples_on_all=_rank_on_all(policy),
            )
            invalid = -1.0e12 if policy.negative_scores else -1.0
            return jnp.where(ok_b, s, invalid)

        scores = jax.lax.map(
            per_first,
            (
                ts.reshape(b1, b2 * qcap, 4, 4),
                hyp_ok.reshape(b1, b2 * qcap),
                nbr_idx,
                nbr_in_r,
            ),
        ).reshape(-1)
    ts_flat = ts.reshape(-1, 4, 4)
    return ts_flat, scores, firsts.idx, firsts.valid, jnp.sum(hyp_ok.astype(jnp.int32))


def finalize_round(
    model: CompiledModel,
    prep: ScenePrep,
    consumed: jax.Array,
    fp_mask: jax.Array,
    t_best: jax.Array,
    first_idx: jax.Array,
    first_valid: jax.Array,
    n_hyp,
    dist_thres,
    model_match_factor,
    *,
    policy: SearchPolicy,
    max_icp_iterations: int,
):
    """ICP-refine finalist poses and run greedy non-overlap acceptance.

    The join half of the round (impl/scene.hpp:168-240).  ``t_best`` is
    [F, 4, 4] finalist poses (already top-k'ed, possibly gathered across
    devices).  Returns (RoundResult, consumed', fp').
    """
    cloud = prep.cloud
    fp_next = fp_mask.at[first_idx].set(fp_mask[first_idx] | first_valid)
    (t_fin, accept, new_corr, corr_midx, fin_counts, fin_scores,
     consumed_next, join_overflow) = accept_and_polish(
        model, cloud, prep.tangent_mask, consumed, t_best, dist_thres,
        model_match_factor, policy=policy,
        max_icp_iterations=max_icp_iterations,
    )
    result = RoundResult(
        transform=t_fin,
        accept=accept,
        new_corr=new_corr,
        model_idx=corr_midx,
        count=fin_counts,
        score=fin_scores,
        hypotheses_scored=n_hyp,
        join_overflow=join_overflow,
    )
    return result, consumed_next, fp_next


# HBM budget (in F*N rows) for the finalist-batched ICP/finish_find maps.
# XLA fuses the per-finalist transformed-scene intermediates of a vmapped
# finish_find into one [F*N, 3] buffer whose TPU T(8,128) layout pads the
# minor dim 3 -> 128 lanes (512 B/row): at the density-adaptive 16-finalist
# funnel on a 4M-point scene that is 34 GB and the round executable cannot
# compile (evidence_r4/scaling_fin.log).  2^23 rows (<= 4.3 GB padded) keeps
# every hardware-validated shape — up to 500k-dense F=16 and 4M F=4 — on the
# plain-vmap path; beyond it finalists map in chunks of the largest fitting
# batch.
_FINALIST_ROW_BUDGET = 8 * 1024 * 1024


def _auto_join_capacity(n_scene: int) -> int:
    """Fog-switch default for ``policy.join_subset_capacity``: pow2 of
    max(65536, N/16).  The in-grid candidate population of a posed model is
    a few percent of a dense scene (model bbox volume / scene volume), so
    N/16 carries an order-of-magnitude safety margin; overflow, if a scene
    ever concentrates harder, is exact-counted and surfaced in
    LAST_SEARCH_STATS["join_overflow_max"]."""
    want = max(65536, n_scene // 16)
    cap = 1 << (want - 1).bit_length()
    return int(min(cap, n_scene))


def _rank_on_all(policy) -> bool:
    """Effective ``samples_on_all`` for RANKING surfaces (the kernel pack,
    the jnp ranking fallback, and the finalist prescreen).  ``policy.
    rank_edges_only`` narrows ranking eligibility to tangent-bearing points
    — the statistic greedy acceptance actually gates on (score_t >=
    match_factor * n_edge) — without touching ICP/finish_find/acceptance
    semantics.  Fog has no tangents, so fog-embedded poses rank at 0 where
    all-point counts drown the true pose (evidence_r4/diag4m_s2_*)."""
    return policy.samples_on_all and not bool(policy.rank_edges_only)


def _finalist_map(fn, ts, n_scene: int, *extra):
    """vmap ``fn`` over finalist poses ``ts`` [F, 4, 4] (plus optional
    per-finalist ``extra`` pytrees), chunking the batch when F * n_scene
    would materialize scene-sized per-finalist fusions beyond
    ``_FINALIST_ROW_BUDGET`` (see above).  Per-finalist results are
    independent, so chunking is a pure regrouping (equal to float
    tolerance: batched and unbatched linalg kernels round differently in
    the Kabsch SVD — pinned by test_finalist_chunked_map_equivalent)."""
    f = int(ts.shape[0])
    if f * n_scene <= _FINALIST_ROW_BUDGET:
        return jax.vmap(fn)(ts, *extra)
    fc = max(1, _FINALIST_ROW_BUDGET // max(n_scene, 1))
    if extra:
        return jax.lax.map(lambda a: fn(*a), (ts, *extra), batch_size=min(fc, f))
    return jax.lax.map(fn, ts, batch_size=min(fc, f))


def _candidate_subset(model, cloud, tangent_mask, consumed, ts, dist_thres,
                      capacity: int, slack: float):
    """Per-finalist candidate sub-scenes for the join's scene-sized passes.

    A scene point can correspond to a posed model ONLY if its transformed
    position lands inside the voxel grid: every scoring surface gates on
    ``voxel_query``'s in_bounds (the nullopt branch of
    /root/reference/include/impl/model.hpp:180-192), so the points whose
    voxel coordinates fall within the grid plus a slack border are an exact
    eligibility superset while the pose stays within the slack (``slack``
    is in multiples of the relaxed 2x gate; the join regathers candidates
    at each phase boundary — prescreen/ICP at the ranked pose, tight polish
    at the relaxed-ICP pose, final claim at the polished pose).  The +1.5
    voxel floor covers ``voxel_query_exact``'s half-voxel widening.

    Returns (sub_cloud, sub_tangent_mask, sub_consumed, idx, idx_valid,
    n_candidates), each with a leading finalist dim; padding rows carry
    valid=False / consumed=True.  ``n_candidates`` is the exact per-finalist
    in-border population — values above ``capacity`` mean the subset pass
    undercounted and are surfaced as the join_overflow stat.
    """
    n = cloud.xyz.shape[0]
    cap = int(min(int(capacity), n))
    relaxed_w = 2.0 * jnp.float32(dist_thres) * model.resolution
    ex, ey, ez = model.lut.shape
    hi = jnp.asarray([ex - 1, ey - 1, ez - 1], jnp.float32)
    scale = jnp.diagonal(model.to_voxel)[:3]
    s_vox = jnp.float32(slack) * relaxed_w * scale + 1.5

    def one(t):
        m = model.to_voxel @ t  # scene point -> voxel coords, one affine
        v = jnp.matmul(cloud.xyz, m[:3, :3].T,
                       precision=jax.lax.Precision.HIGHEST) + m[:3, 3]
        mask = jnp.all((v >= -s_vox) & (v <= hi + s_vox), axis=-1) & cloud.valid
        idx = jnp.where(mask, size=cap, fill_value=n)[0].astype(jnp.int32)
        return idx, jnp.sum(mask, dtype=jnp.int32)

    idx, n_cand = jax.lax.map(one, ts)  # sequential over F: no [F, N, 3] buffer
    idx_valid = idx < n
    idxc = jnp.minimum(idx, n - 1)
    sub_cloud = cl.PointCloud(
        xyz=cloud.xyz[idxc], normal=cloud.normal[idxc],
        tangent=cloud.tangent[idxc], valid=cloud.valid[idxc] & idx_valid,
    )
    return (sub_cloud, tangent_mask[idxc], consumed[idxc] | ~idx_valid,
            idx, idx_valid, n_cand)


def _scatter_corrs(idx, idx_valid, sub_valid, sub_midx, n: int):
    """Scatter per-finalist subset correspondences back to scene shape
    ([F, C] -> [F, N]); padding rows (fill index n) drop out of bounds."""

    def one(i, iv, v, m):
        full_v = jnp.zeros((n,), bool).at[i].set(v & iv, mode="drop")
        full_m = jnp.zeros((n,), jnp.int32).at[i].set(
            jnp.where(iv, m, 0), mode="drop")
        return full_v, full_m

    return jax.vmap(one)(idx, idx_valid, sub_valid, sub_midx)


def accept_and_polish(model, cloud, tangent_mask, consumed, t_best, dist_thres,
                      model_match_factor, *, policy: SearchPolicy,
                      max_icp_iterations: int, axis_name: str | None = None):
    """Relaxed ICP + greedy acceptance + gated tight polish — the join tail
    shared by every round flavor (single-chip ``finalize_round``, dp, and
    the sp-sharded 2-D round, which passes ``axis_name`` so the count/claim
    reductions psum over the scene shards).  Single home so an acceptance
    fix can never land in one path and miss another.

    Returns (t_fin, accept, new_corr, model_idx, counts, scores,
    consumed', join_overflow).  ``new_corr``/``model_idx``/``consumed'``
    are shaped like the (possibly sharded) scene axis of ``cloud``;
    ``join_overflow`` is the worst per-finalist candidate overflow of the
    subset join (0 when the subset passes were exact or the subset path is
    off — see ``policy.join_subset_capacity``).
    """
    n_scene = int(cloud.xyz.shape[0])
    cap = int(policy.join_subset_capacity or 0)
    use_subset = 0 < cap < n_scene
    join_overflow = jnp.int32(0)

    def _subset(ts):
        return _candidate_subset(model, cloud, tangent_mask, consumed, ts,
                                 dist_thres, cap, policy.join_subset_slack)

    # exact-count prescreen: when the fog switch widened the funnel, rank
    # the widened set by ONE full-scene relaxed-count pass each (the
    # acceptance statistic itself — the true pose's margin over fog poses
    # is ~n_model against a sqrt(fog-in-band) fluctuation, so this ranking
    # is density-robust where the pack-based rescore is not) and keep only
    # ``finalist_prescreen`` poses for the full relaxed-ICP join.  Cuts
    # the scene-sized join from F*(icp_iters+1) passes to
    # F + keep*(icp_iters+1) and bounds the round program's runtime at the
    # 4M envelope edge (evidence_r4/scaling_r.log execution fault).
    keep = int(policy.finalist_prescreen)
    if 0 < keep < int(t_best.shape[0]):
        from triplet_match_tpu.search.score import finish_find as _pre_ff

        def _pre_count(t, sc, tm, co):
            return _pre_ff(
                model, sc, tm, co, t, 2.0 * dist_thres,
                weighted_distance=policy.weighted_distance,
                negative_scores=policy.negative_scores,
                samples_on_all=_rank_on_all(policy),
                axis_name=axis_name,
            ).count

        if use_subset:
            sub, stm, scons, _, _, n_cand = _subset(t_best)
            pre_counts = _finalist_map(_pre_count, t_best, cap, sub, stm, scons)
            join_overflow = jnp.maximum(
                join_overflow, jnp.max(n_cand) - jnp.int32(cap))
        else:
            pre_counts = _finalist_map(
                lambda t: _pre_count(t, cloud, tangent_mask, consumed),
                t_best, n_scene,
            )
        # counts are psum'd inside finish_find under axis_name, so the
        # top_k selection is shard-invariant; ties break toward the
        # higher-ranked hypothesis (top_k is stable in index order)
        _, sel = jax.lax.top_k(pre_counts, keep)
        t_best = t_best[sel]

    # reference-faithful relaxed ICP only; the tight polish runs AFTER (and
    # gated on) acceptance — it improves the reported pose, never which
    # matches are accepted, so the no-match confirmation rounds skip its
    # finish_find passes entirely (3 of the 5 per round at 131k — ROADMAP 3e)
    def _icp(t, sc, tm, co):
        return icp_refine(
            model, sc, tm, co, t, dist_thres, max_icp_iterations,
            tight_iterations=0,
            weighted_distance=policy.weighted_distance,
            negative_scores=policy.negative_scores,
            point_to_plane=policy.icp_point_to_plane,
            samples_on_all=policy.samples_on_all,
            axis_name=axis_name,
        )

    if use_subset:
        sub, stm, scons, s_idx, s_ividx, n_cand = _subset(t_best)
        icp = _finalist_map(_icp, t_best, cap, sub, stm, scons)
        join_overflow = jnp.maximum(
            join_overflow, jnp.max(n_cand) - jnp.int32(cap))
        corr_valid, corr_midx = _scatter_corrs(
            s_idx, s_ividx, icp.corrs.valid, icp.corrs.model_idx, n_scene)
    else:
        icp = _finalist_map(
            lambda t: _icp(t, cloud, tangent_mask, consumed),
            t_best, n_scene,
        )
        corr_valid = icp.corrs.valid  # [F, N] (sharded N under axis_name)
        corr_midx = icp.corrs.model_idx
    t_fin = icp.transform
    fin_counts = icp.corrs.count  # [F] replicated (psum'd under axis_name)
    fin_scores = icp.corrs.score

    # --- greedy acceptance (impl/scene.hpp:193-237) ---
    order = jnp.argsort(-fin_counts)
    min_pts = jnp.floor(model_match_factor * model.n_edge.astype(jnp.float32)).astype(jnp.int32)
    min_pts_all = jnp.floor(model_match_factor * model.n_all.astype(jnp.float32)).astype(jnp.int32)

    def accept_step(used, f):
        cv = corr_valid[f]
        new = cv & ~used
        score_t = jnp.sum((new & tangent_mask).astype(jnp.int32))
        score_all = jnp.sum(new.astype(jnp.int32))
        if axis_name is not None:
            score_t = jax.lax.psum(score_t, axis_name)
            score_all = jax.lax.psum(score_all, axis_name)
        ok = (score_t >= min_pts) & (score_all >= min_pts_all)
        used = jnp.where(ok, used | cv, used)
        return used, (ok, new)

    _, (acc_ord, new_ord) = jax.lax.scan(accept_step, consumed, order)
    # un-permute back to finalist order
    inv_order = jnp.argsort(order)
    accept = acc_ord[inv_order]
    new_corr = new_ord[inv_order]

    consumed_next = consumed | jnp.any(new_corr & accept[:, None], axis=0)

    if max_icp_iterations > 0:
        t_fin, new_corr, corr_midx, fin_counts, fin_scores, consumed_next = (
            polish_accepted(
                model, cloud, tangent_mask, consumed, dist_thres, policy,
                t_fin, accept, order, acc_ord, inv_order,
                (new_corr, corr_midx, fin_counts, fin_scores, consumed_next),
                axis_name=axis_name,
            )
        )

    if axis_name is not None:
        # per-shard candidate counts differ; replicate the worst overflow
        join_overflow = jax.lax.pmax(join_overflow, axis_name)
    return (t_fin, accept, new_corr, corr_midx, fin_counts, fin_scores,
            consumed_next, join_overflow)


def polish_accepted(model, cloud, tangent_mask, consumed, dist_thres, policy,
                    t_fin, accept, order, acc_ord, inv_order, unpolished,
                    axis_name: str | None = None):
    """Acceptance-gated tight polish with self-consistent reporting.

    When any finalist was accepted, tight-polish all finalist poses, then
    RE-DERIVE every reported field at the polished poses — dense
    correspondences (relaxed gate), counts, signed scores, the greedy
    point-claim (same order, FROZEN accept decisions), and the consumed
    mask — so ``Match.transform`` and its corrs/score describe the same
    pose.  The acceptance *decision* stays at the un-polished relaxed-ICP
    pose (the reference's semantics, impl/scene.hpp:193-237); no-accept
    confirmation rounds skip everything here (lax.cond).

    ``unpolished`` = (new_corr, model_idx, counts, scores, consumed_next)
    from the acceptance pass, returned untouched on the skip path.
    """
    from triplet_match_tpu.refine.icp import tight_polish
    from triplet_match_tpu.search.score import finish_find

    relaxed = 2.0 * dist_thres  # icp_'s reporting gate (impl/scene.hpp:373)
    n_scene = int(cloud.xyz.shape[0])
    cap = int(policy.join_subset_capacity or 0)
    use_subset = 0 < cap < n_scene

    def polish_branch(ts):
        def _polish(t, sc, tm, co):
            return tight_polish(
                model, sc, tm, co, t, dist_thres,
                iterations=policy.tight_icp_iterations,
                orientation_weight=policy.tight_orientation_weight,
                anneal=policy.tight_anneal,
                edges_only=bool(policy.tight_edges_only),
                weighted_distance=policy.weighted_distance,
                negative_scores=policy.negative_scores,
                point_to_plane=policy.icp_point_to_plane,
                point_to_line_at_floor=bool(policy.tight_point_to_line),
                samples_on_all=policy.samples_on_all,
                axis_name=axis_name,
            )

        def _ff(t, sc, tm, co):
            return finish_find(
                model, sc, tm, co, t, relaxed,
                weighted_distance=policy.weighted_distance,
                negative_scores=policy.negative_scores,
                samples_on_all=policy.samples_on_all,
                axis_name=axis_name,
            )

        if use_subset:
            # regather at each phase boundary: tight polish on candidates
            # at the entry (relaxed-ICP) poses, the final claim pass on
            # candidates at the polished poses
            sub, stm, scons, _, _, _ = _candidate_subset(
                model, cloud, tangent_mask, consumed, ts, dist_thres, cap,
                policy.join_subset_slack)
            t_pol = _finalist_map(_polish, ts, cap, sub, stm, scons)
            sub2, stm2, scons2, p_idx, p_ividx, _ = _candidate_subset(
                model, cloud, tangent_mask, consumed, t_pol, dist_thres, cap,
                policy.join_subset_slack)
            corrs_sub = _finalist_map(_ff, t_pol, cap, sub2, stm2, scons2)
            corr_v, corr_m = _scatter_corrs(
                p_idx, p_ividx, corrs_sub.valid, corrs_sub.model_idx, n_scene)
            counts_p, scores_p = corrs_sub.count, corrs_sub.score
        else:
            t_pol = _finalist_map(
                lambda t: _polish(t, cloud, tangent_mask, consumed),
                ts, n_scene)
            corrs = _finalist_map(
                lambda t: _ff(t, cloud, tangent_mask, consumed),
                t_pol, n_scene)
            corr_v, corr_m = corrs.valid, corrs.model_idx
            counts_p, scores_p = corrs.count, corrs.score

        def claim(used, args):
            f, ok = args
            cv = corr_v[f]
            new = cv & ~used
            used = jnp.where(ok, used | cv, used)
            return used, new

        _, new_ord = jax.lax.scan(claim, consumed, (order, acc_ord))
        new_c = new_ord[inv_order]
        consumed2 = consumed | jnp.any(new_c & accept[:, None], axis=0)
        return t_pol, new_c, corr_m, counts_p, scores_p, consumed2

    return jax.lax.cond(
        accept.any(), polish_branch, lambda ts: (ts,) + unpolished, t_fin
    )


def search_round(
    model: CompiledModel,
    prep: ScenePrep,
    consumed: jax.Array,
    fp_mask: jax.Array,
    key: jax.Array,
    dist_thres,
    model_match_factor,
    mpack=None,
    *,
    discretization: DiscretizationParams,
    sample_params: SampleParams,
    policy: SearchPolicy,
    max_icp_iterations: int,
):
    """One jitted single-chip search round.  Returns (RoundResult, consumed', fp')."""
    ts_flat, scores, first_idx, first_valid, n_hyp = hypothesize_and_score(
        model, prep, consumed, fp_mask, key, dist_thres, mpack,
        discretization=discretization, sample_params=sample_params, policy=policy,
    )
    _, best = jax.lax.top_k(scores, policy.finalists)
    t_best = ts_flat[best]
    return finalize_round(
        model, prep, consumed, fp_mask, t_best, first_idx, first_valid, n_hyp,
        dist_thres, model_match_factor,
        policy=policy, max_icp_iterations=max_icp_iterations,
    )


def adaptive_outer_bound(n_model: int, n_left: int, n_scene: int,
                         policy: SearchPolicy) -> int:
    """Adaptive RANSAC outer sampling bound (impl/scene.hpp:131-141).

    Number of first points to try so that, with probability
    ``match_probability``, at least one lands on a present instance:
    ``log(1-p) / log(1 - n_model/n_left)`` clamped to
    ``[min_sample_count, n_scene]``; ``force_exhaustive`` overrides to
    ``n_scene``.  ``n_model`` is the model edge-subset size, ``n_left`` the
    currently eligible (unconsumed, un-tried) scene edge points, ``n_scene``
    the scene edge-point total at prepare time.
    """
    if policy.force_exhaustive:
        return max(int(n_scene), 1)
    if n_left <= 0:
        return 0
    outer_prob = min(float(n_model) / float(n_left), 1.0)
    if outer_prob >= 1.0:
        bound = policy.min_sample_count
    else:
        bound = int(
            np.log(1.0 - policy.match_probability) / np.log(1.0 - outer_prob)
        )
    bound = max(bound, policy.min_sample_count)
    return min(bound, max(int(n_scene), 1))


_BALL_Q_CACHE: dict = {}  # id(xyz) -> (weakref(xyz), params_key, value)
_BALL_Q_CACHE_MAX = 16


@partial(jax.jit, static_argnames=("sample", "ref_sample", "quantile"))
def _ball_quantile_device(xyz, valid, tangent_mask, diameter, key, *,
                          sample: int, ref_sample: int, quantile: float):
    """Device body of :func:`ball_population_quantile`: uniform samples via
    random-score top_k (no host transfer of the scene arrays — only the
    scalar result crosses).  Returns (quantile_value, n_edge_eligible);
    the value is NaN when no eligible firsts exist."""
    n = xyz.shape[0]
    edge_ok = tangent_mask & valid
    ru = jax.random.uniform(key, (n,))
    f_score = jnp.where(edge_ok, ru, -1.0)
    _, fidx = jax.lax.top_k(f_score, min(sample, n))
    f_ok = f_score[fidx] >= 0.0
    ru2 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    s_score = jnp.where(valid, ru2, -1.0)
    _, sidx = jax.lax.top_k(s_score, min(ref_sample, n))
    s_ok = s_score[sidx] >= 0.0
    d2 = jnp.sum(
        jnp.square(xyz[fidx][:, None, :] - xyz[sidx][None, :, :]), axis=-1)
    in_ball = (d2 <= jnp.square(diameter)) & s_ok[None, :]
    n_sub = jnp.maximum(jnp.sum(s_ok), 1)
    n_valid = jnp.sum(valid)
    frac = jnp.sum(in_ball, axis=1) / n_sub.astype(jnp.float32)
    pop = jnp.where(f_ok, frac * n_valid.astype(jnp.float32), jnp.nan)
    return jnp.nanquantile(pop, quantile), jnp.sum(edge_ok)


def ball_population_quantile(prep: "ScenePrep", model: CompiledModel, *,
                             sample: int = 256, ref_sample: int = 65536,
                             quantile: float = 0.95, seed: int = 0) -> float:
    """Estimated ``quantile``-percentile population of the model-diameter
    ball around eligible first points (the reference's
    ``radius_search_inclusive`` count, impl/scene.hpp:276).

    One jitted [sample, ref_sample] pass over device-side subsamples — the
    shared density statistic behind ``adaptive_inner_bound`` and the
    fog-density fine-rescore switch in ``find_all``.  Computed ON DEVICE:
    the previous host-side pass pulled the full xyz array across (48 MB at
    4M points — seconds through the TPU tunnel, paid once per
    (prep, model) and twice per multi-model search); only the scalar
    crosses now.  Returns 0.0 when the scene has no eligible edge points.

    Memoized on the identities of ``prep.cloud.xyz``/``valid``/
    ``tangent_mask`` (plus the parameters):
    the statistic is deterministic, and repeat searches against one prep —
    find_all_multi's per-model loop, multi-instance extraction, the recall
    studies — would otherwise pay the dense pass on every call.
    """
    pkey = (float(model.diameter), sample, ref_sample, quantile, seed)
    # the statistic reads valid and tangent_mask too — masked-patch preps
    # (find_all_multi shares xyz but swaps valid) must not reuse a stale
    # density, so all three arrays key the memo
    arrs = (prep.cloud.xyz, prep.cloud.valid, prep.tangent_mask)
    ck = tuple(id(a) for a in arrs)
    hit = _BALL_Q_CACHE.get(ck)
    if (hit is not None and all(r() is a for r, a in zip(hit[0], arrs))
            and hit[1] == pkey):
        return hit[2]
    q, n_edge_ok = _ball_quantile_device(
        prep.cloud.xyz, prep.cloud.valid, prep.tangent_mask,
        jnp.float32(model.diameter), jax.random.PRNGKey(seed),
        sample=sample, ref_sample=ref_sample, quantile=quantile)
    q, n_edge_ok = float(q), int(n_edge_ok)
    out = 0.0 if (n_edge_ok == 0 or math.isnan(q)) else q
    _BALL_Q_CACHE[ck] = (tuple(weakref.ref(a) for a in arrs), pkey, out)
    while len(_BALL_Q_CACHE) > _BALL_Q_CACHE_MAX:
        _BALL_Q_CACHE.pop(next(iter(_BALL_Q_CACHE)))
    return out


def adaptive_inner_bound(prep: "ScenePrep", model: CompiledModel,
                         policy: SearchPolicy, *, sample: int = 256,
                         ref_sample: int = 65536, quantile: float = 0.95,
                         seed: int = 0, ball_q: float | None = None) -> int:
    """Per-first adaptive inner sampling bound (impl/scene.hpp:276-282).

    The reference sizes second-point effort per first point as
    ``-log(1-p) / prob`` with ``prob = n_model_all / |ball|``, where
    ``|ball|`` is the population of the model-diameter ball around the
    first (ALL scene points, ``radius_search_inclusive``), clamped to
    ``[min_sample_count, |ball|]``; ``force_exhaustive`` overrides to
    ``|ball|``.

    Static TPU shapes preclude a per-first bound, so this estimates the
    ``quantile``-percentile ball population over ``sample`` random eligible
    first points (against a ``ref_sample``-point scene subsample, unbiased
    density scaling) and returns the reference bound at that density —
    one number covering the dense tail of the firsts.  ``find_all`` raises
    the effective ``num_second_samples`` to it when it exceeds the static
    default (it never lowers: a masked-out sample under static shapes
    saves nothing and only costs recall).
    """
    if ball_q is None:
        ball_q = ball_population_quantile(
            prep, model, sample=sample, ref_sample=ref_sample,
            quantile=quantile, seed=seed)
    if ball_q <= 0.0:
        return policy.min_sample_count
    if policy.force_exhaustive:
        return max(int(math.ceil(ball_q)), policy.min_sample_count)
    n_all = max(int(model.n_all), 1)
    bound = -math.log(1.0 - policy.match_probability) * ball_q / n_all
    bound = max(bound, policy.min_sample_count)
    return int(math.ceil(min(bound, ball_q)))


LAST_SEARCH_STATS: dict = {}

# per-model snapshots of LAST_SEARCH_STATS from the most recent
# find_all_multi call (one dict per model, in model order)
LAST_MULTI_SEARCH_STATS: list = []

# jitted round executables keyed by (mesh-or-"single", config dataclasses) —
# see find_all.  LRU-bounded: each entry pins a compiled executable (plus a
# Mesh key holding device references), and parameter sweeps that construct
# many distinct SearchPolicy values in one process would otherwise
# accumulate programs for the process lifetime.
_ROUND_FN_CACHE_MAX = 8
_ROUND_FN_CACHE: dict = {}


def clear_round_cache() -> None:
    """Drop all cached round executables (frees compiled programs)."""
    _ROUND_FN_CACHE.clear()


def reserve_round_cache(n: int) -> None:
    """Grow the round-executable LRU to hold at least ``n`` programs.

    Serving sessions that legitimately need many resident programs (a
    MultiMatcher warming models x buckets) must raise the bound BEFORE
    warmup, or the LRU evicts the earliest warmed entries before traffic
    arrives.  Never shrinks (sweeps rely on the small default)."""
    global _ROUND_FN_CACHE_MAX
    _ROUND_FN_CACHE_MAX = max(_ROUND_FN_CACHE_MAX, int(n))


def _publish_stats(stats: dict, profiler=None) -> None:
    """Populate the module-level stats snapshot (the reference declares a
    ``statistics{rejection_rate}`` struct but never fills it,
    include/scene:31-33 — ours is real)."""
    fin = max(stats.get("finalists", 0), 1)
    LAST_SEARCH_STATS.clear()
    LAST_SEARCH_STATS.update(stats)
    LAST_SEARCH_STATS["rejection_rate"] = 1.0 - stats.get("accepted", 0) / fin
    if profiler is not None and profiler.phases:
        LAST_SEARCH_STATS["round_ms_avg"] = profiler.phases["round"].value
        LAST_SEARCH_STATS["profile"] = profiler.report()


@dataclasses.dataclass
class Match:
    """Accepted match (``match_t``, /root/reference/include/scene:23-28).

    ``transform`` maps model -> scene (the reference inverts before returning,
    impl/scene.hpp:92).  ``cast_score`` is filled by raycast-verified search
    (matched / visible — the disabled OptiX path, impl/scene.hpp:173-187).
    """

    transform: np.ndarray  # [4,4] model -> scene
    scene_corrs: np.ndarray  # [K] scene point indices (newly claimed)
    model_corrs: np.ndarray  # [K] model point indices
    signed_score: float  # normalized signed score (score / model size)
    cast_score: float | None = None


def find_all(
    model: CompiledModel,
    scene_cloud: cl.PointCloud,
    *,
    dist_thres: float | None = None,
    model_match_factor: float = 0.4,
    early_out_factor: float = 0.9,
    sample_params: SampleParams = DEFAULT_SAMPLE_PARAMS,
    discretization: DiscretizationParams = DEFAULT_DISCRETIZATION,
    policy: SearchPolicy = DEFAULT_POLICY,
    max_icp_iterations: int = 10,
    seed: int = 13,
    prep: ScenePrep | None = None,
    mesh=None,
    progress=None,
) -> list[Match]:
    """Find all model instances in the scene.

    API analog of ``scene::find_all_parallel``
    (/root/reference/include/scene:47-48).  Deterministic for a fixed seed
    (the reference is clock-seeded).

    ``mesh`` routes each round through the multi-chip shardings: a 1-axis
    ``jax.sharding.Mesh`` runs hypothesis data parallelism (each chip is
    its own RANSAC chunk, ``parallel.search.search_round_dp``), a 2-axis
    ("dp", "sp") mesh additionally shards every scene-length array over the
    sp axis (``parallel.search2d.search_round_2d``; scene capacity must be
    divisible by the sp extent, and the scorer runs through the Pallas
    kernel — set ``policy.pallas_interpret`` off-TPU), and a 3-axis
    ("dcn", "dp", "sp") mesh runs one RANSAC chunk per (slice, dp) pair
    with a hierarchical finalist join (ICI within the slice, one F-pose
    hop over DCN).  The adaptive phase budget accounts for the total chunk
    count (each round samples ``num_first_samples * dcn * dp`` firsts).

    Control flow mirrors the reference's two nested loops: the outer
    multi-instance loop (impl/scene.hpp:70-95) runs *phases*; each phase is
    one ``find_parallel`` analog whose sampling effort is the adaptive
    RANSAC outer bound ``log(1-p)/log(1-n_model/|left|)`` recomputed from
    the live masks (impl/scene.hpp:131-141), executed as
    ``ceil(outer_bound / num_first_samples)`` jitted rounds.  The search
    reports "no match" only after a full phase (the 0.999-probability
    sample budget) yields nothing.  ``early_out`` stops a phase's remaining
    rounds once an accepted match reaches
    ``early_out_factor * possible_model`` correspondences
    (impl/scene.hpp:330-347).  ``dist_thres=None`` defaults to
    ``policy.corr_dist_factor`` (= the reference's only dist_thres value).

    ``progress``: optional callable polled after every round with the
    fraction of the current phase's round budget completed (resets at each
    phase, like the reference's per-``find_parallel`` progress_bar,
    src/progress_bar.cpp:10-48) — e.g. ``utils.progress.ProgressBar.poll``.
    """
    if dist_thres is None:
        dist_thres = policy.corr_dist_factor
    if prep is None:
        prep = prepare_scene(scene_cloud, policy, mesh=mesh)

    from triplet_match_tpu.utils.timer import Profiler

    profiler = Profiler()
    stats = {"rounds": 0, "phases": 0, "hypotheses_scored": 0, "finalists": 0,
             "accepted": 0}

    dp_size = 1
    round_base = search_round
    round_kind = "single"
    if mesh is not None:
        round_kind = mesh
        if len(mesh.axis_names) >= 2:
            # ("dp", "sp") or ("dcn", "dp", "sp"): scene sharded over the
            # LAST axis; every leading axis is an independent RANSAC chunk
            from triplet_match_tpu.parallel.search2d import search_round_2d_prep

            sp_ext = mesh.shape[mesh.axis_names[-1]]
            if prep.cloud.xyz.shape[0] % sp_ext:
                raise ValueError(
                    f"scene capacity {prep.cloud.xyz.shape[0]} not divisible by "
                    f"sp extent {sp_ext}; pad the cloud capacity "
                    f"(core.cloud.pad_capacity)"
                )
            # multi-controller runtimes must receive fully-replicated
            # outputs: the host loop below reads consumed/fp/new_corr with
            # np.asarray, which raises on non-fully-addressable arrays
            round_base = partial(search_round_2d_prep, mesh,
                                 replicate_outputs=jax.process_count() > 1)
            for ax in mesh.axis_names[:-1]:
                dp_size *= mesh.shape[ax]
        else:
            from triplet_match_tpu.parallel.search import search_round_dp

            round_base = partial(search_round_dp, mesh)
            dp_size = mesh.shape[mesh.axis_names[0]]

    # dense-scene inner-bound raise (impl/scene.hpp:276-282): when the
    # reference's per-first second-point bound exceeds the static cap,
    # widen the effective batch (power of two bounds shape churn; the
    # round cache and AOT cache key on the resulting policy).
    eff_b2 = policy.num_second_samples
    ball_q = None
    if policy.adaptive_second_samples or policy.adaptive_fine_rescore:
        with profiler.section("ball_quantile"):
            ball_q = ball_population_quantile(prep, model)
    if policy.adaptive_second_samples:
        bound = adaptive_inner_bound(prep, model, policy, ball_q=ball_q)
        if bound > policy.num_second_samples:
            # TWO-RUNG LADDER (executable-count discipline, ROADMAP 22):
            # every distinct eff_b2 is its own round executable whose
            # first-ever resolution pays the erratic remote compile
            # (45-342 s observed).  Round-4 evidence resolved rungs
            # {64, 128, 256} across the dense protocols — collapsing all
            # raises to max_second_samples trades <= 4x of a ~50 ms round
            # kernel (more second samples never costs recall: the
            # reference bound stays a floor) for 2 fewer executables per
            # (capacity, fog-flavor), and lets warmup cover the whole
            # ladder with one dense scene per bucket.
            eff_b2 = policy.max_second_samples
            policy = dataclasses.replace(
                policy, num_second_samples=eff_b2,
                second_pool=max(policy.second_pool, 2 * eff_b2),
            )
    stats["num_second_samples_effective"] = eff_b2

    use_pallas = policy.scorer == "pallas" or (
        policy.scorer == "auto" and jax.default_backend() == "tpu"
    )
    if mesh is not None and len(mesh.axis_names) >= 2:
        use_pallas = True  # the 2-D round scores through the fused kernel
        # (decided BEFORE the adaptive-rescore gate below: a CPU 2-axis
        # mesh with scorer="auto" still ranks through the two-phase kernel
        # and needs the fog-density protection just the same)

    # fog-density-adaptive EXACT routing (see config.adaptive_fine_rescore):
    # a fog-dominated diameter ball blurs the coarse-block phase-1 ordering
    # AND the fine_coarse block rescore past what the strict-primary count
    # can resolve, so dense scenes route to the exact two-phase
    # configuration: phase 1 ranks on the FULL pack (no coverage-radius
    # slack), survivors (keep 1/8) rescore on the full pack at full K.
    # Hardware A/B at 500k, 10 touching-fog seeds (RESULTS_r4
    # r4_hw_recall500k): the exact routing is BOTH faster (21.7 s vs
    # 23.8 s mean) and uniformly precise (all seeds <=0.044 mm, vs one
    # 0.99 mm two-phase finalist-choice outlier with the coarse block
    # phase 1 + stride-4 rescore of the pre-r4 switch).
    stats["fine_rescore_full"] = False
    if (policy.adaptive_fine_rescore and use_pallas and policy.two_phase_scoring
            and policy.two_phase_fine_coarse and ball_q is not None
            and ball_q > policy.fine_full_rescore_ratio * policy.score_neighbors):
        # full-K rescore under ranking_mode="full" holds [K, N] distance AND
        # weight tiles per pose — at K=512 x a 4096-point pack that exceeds
        # the scoped-VMEM trace guard (score_groups_pallas), so full mode
        # keeps its configured stride; count mode (the default and the
        # reference's ranking) goes full-K
        fine_stride = (policy.two_phase_fine_stride
                       if policy.ranking_mode == "full" else 1)
        # widen the finalist funnel too: a fog-dominated scene ranks ~1M
        # hypotheses whose count margins are fog noise, and the true pose
        # only needs to CRACK the finalist set (acceptance gates it with
        # exact full-scene counts) — at the 4M envelope edge the default
        # 4-finalist funnel measured 1 round x 4 fog finalists x 0 accepts
        # on one seed (evidence_r4/prof4m.log, rejection_rate 1.0)
        policy = dataclasses.replace(
            policy, two_phase_coarse_model=False, two_phase_fine_coarse=False,
            two_phase_fine_stride=fine_stride,
            two_phase_keep_frac=min(policy.two_phase_keep_frac, 8),
            finalists=max(policy.finalists, policy.adaptive_finalists),
            finalist_prescreen=(policy.finalist_prescreen
                                or policy.finalists),
            # rank by the acceptance statistic: in the fog regime all-point
            # counts are dominated by fog-embedded poses that can never be
            # accepted (acceptance needs tangent-bearing corrs; fog has no
            # tangents) — the 4M seed-2 true pose cracks neither a 16- nor
            # 32-wide funnel under all-point ranking (diag4m_s2_*).  Only
            # meaningful when the model has edge points to gate on.
            rank_edges_only=(policy.rank_edges_only
                             if policy.rank_edges_only is not None
                             else int(model.n_edge) > 0),
            # anchor the tight polish to the same edge corrs: the all-point
            # annealed fit settles in a fog-shifted attractor at the 4M
            # envelope edge (6.3 mm / 2.6 deg, evidence_r5/diag4m_s2_r5) —
            # fog has no tangents, so the edge-gated fit is immune; each
            # step falls back to all-point weights below 12 edge corrs
            tight_edges_only=(policy.tight_edges_only
                              if policy.tight_edges_only is not None
                              else int(model.n_edge) > 0),
            # ... and fit those steps point-to-line: edge corrs are
            # nearest SAMPLES of the edge curves, so point-to-point
            # carries the along-edge sampling phase (and the full error
            # of any mis-associated neighbor sample); the hybrid GN
            # projects residuals perpendicular to the model tangent
            # (scripts/study_p2l_polish.py: worst 2.94 -> 0.27 mm)
            tight_point_to_line=(policy.tight_point_to_line
                                 if policy.tight_point_to_line is not None
                                 else int(model.n_edge) > 0),
            # bound the join's scene-sized passes: gather per-finalist
            # in-grid candidate subsets (exact by the voxel_query in_bounds
            # superset argument — _candidate_subset) instead of walking all
            # N points per prescreen/ICP/polish pass.  Dense scenes are
            # exactly where the full-scene join dominates (2M steady 52 s,
            # RESULTS_r4 r4_hw_scaling_t).
            join_subset_capacity=(policy.join_subset_capacity
                                  if policy.join_subset_capacity is not None
                                  else _auto_join_capacity(
                                      int(prep.cloud.xyz.shape[0]))),
            # ... and take the scene's edge identity from the RAW
            # provided tangents: acceptance needs score_t >=
            # model_match_factor * model n_edge tangent corrs, and dense
            # fog starves the curvature-gated detection below that
            # threshold (6M seed 2: rejection_rate 1.0 with detection,
            # evidence_r5/diag6m_s2_r5) while the raw claim is
            # density-independent.  Detection ⊆ raw, so this only widens.
            scene_raw_tangents=(policy.scene_raw_tangents
                                if policy.scene_raw_tangents is not None
                                else int(model.n_edge) > 0),
        )
        if policy.scene_raw_tangents:
            raw_tm = (jnp.linalg.norm(prep.cloud.tangent, axis=-1)
                      > policy.tangent_norm_threshold) & prep.cloud.valid
            prep = ScenePrep(cloud=prep.cloud, tangent_mask=raw_tm,
                             n_edge=jnp.sum(raw_tm.astype(jnp.int32)))
            stats["scene_raw_tangents"] = True
            stats["scene_n_edge_raw"] = int(prep.n_edge)
        stats["fine_rescore_full"] = True
        stats["finalist_prescreen"] = int(policy.finalist_prescreen)
        stats["rank_edges_only"] = bool(policy.rank_edges_only)
        stats["tight_edges_only"] = bool(policy.tight_edges_only)
        stats["tight_point_to_line"] = bool(policy.tight_point_to_line)
        stats["join_subset_capacity"] = int(policy.join_subset_capacity or 0)
        # the widened ranking funnel (stats["finalists"] counts what reaches
        # the relaxed-ICP join, i.e. the post-prescreen width)
        stats["finalist_funnel"] = int(policy.finalists)
    if ball_q is not None:
        stats["ball_population_q95"] = int(ball_q)
    if use_pallas and not policy.pallas_interpret and jax.default_backend() != "tpu":
        # compiled Pallas kernels exist only for TPU; off-chip runs (CPU
        # meshes, CLI --cpu) must go through interpret mode or pallas_call
        # raises at trace time
        policy = dataclasses.replace(policy, pallas_interpret=True)
        stats["pallas_interpret_forced"] = True
    mpack = None
    if use_pallas:
        from triplet_match_tpu.search import score_pallas as sp

        mpack = sp.pack_model_cached(
            model, coarse_points=policy.coarse_model_points,
            fine_points=policy.fine_model_points)  # host compaction, memoized per (model, knobs)

    n = prep.cloud.xyz.shape[0]
    # host arrays, not jnp: under a multi-controller mesh a committed
    # single-device jnp array cannot be resharded into the global round
    # program, while plain numpy inputs are treated as fully-replicated
    # global values on every runtime (parallel/distributed.py conventions)
    consumed = np.zeros(n, bool)
    fp = np.zeros(n, bool)
    base_key = jax.random.PRNGKey(seed)

    # Cache the jitted round across find_all calls: jax.jit keys on function
    # identity, and a fresh ``partial`` per search would re-trace the whole
    # round graph every time (~2s at 131k even with the XLA compile cache
    # warm).  Repeat searches — multi-scene pipelines, find_all_multi's
    # per-model loop, the recall studies — hit the same executable instead.
    # The key includes the scene/model capacities because a resolved entry
    # may be an AOT ``Compiled`` (single-signature), not a retraceable jit.
    # mpack's leaf shapes are part of the signature too: md_edge/md_surf/
    # md_fine widths derive from the model's edge-vs-surface split (padded
    # to 128), which the capacities alone do not capture — two models with
    # equal point counts but different splits must not share a Compiled.
    mpack_sig = None if mpack is None else tuple(
        (l.shape, l.dtype.name) for l in jax.tree_util.tree_leaves(mpack)
        if hasattr(l, "shape")
    )
    cache_key = (round_kind, discretization, sample_params, policy,
                 max_icp_iterations, n, model.cloud.xyz.shape[0],
                 model.lut.shape, model.keys.shape, mpack_sig)
    round_fn = _ROUND_FN_CACHE.pop(cache_key, None)
    stats["round_fn_cache_hit"] = round_fn is not None
    if round_fn is None:
        round_fn = jax.jit(
            partial(
                round_base,
                discretization=discretization,
                sample_params=sample_params,
                policy=policy,
                max_icp_iterations=max_icp_iterations,
            )
        )
        if round_kind == "single":
            # resolve through the AOT executable disk cache: a warm process
            # skips BOTH tracing (~8.6s at 131k) and the erratic remote
            # backend compile (15-28s observed with the HLO cache "warm") —
            # the reference has no warmup cliff at all (impl/scene.hpp:146)
            from triplet_match_tpu.utils import aot

            example = (model, prep, consumed, fp,
                       jax.random.fold_in(base_key, 0),
                       jnp.float32(dist_thres), jnp.float32(model_match_factor),
                       mpack)
            with profiler.section("aot_resolve"):
                round_fn = aot.get_or_compile(
                    "search_round", round_fn, example,
                    statics=repr((discretization, sample_params, policy,
                                  max_icp_iterations)),
                )
    _ROUND_FN_CACHE[cache_key] = round_fn  # (re)insert as most-recent
    while len(_ROUND_FN_CACHE) > _ROUND_FN_CACHE_MAX:
        _ROUND_FN_CACHE.pop(next(iter(_ROUND_FN_CACHE)))

    # host-side copies of the static eligibility pieces for bound sizing
    edge_valid_np = np.asarray(prep.tangent_mask & prep.cloud.valid)
    n_scene_edge = int(edge_valid_np.sum())  # ``n_scene`` (impl/scene.hpp:53)
    n_model = int(model.n_edge)
    if policy.samples_on_all:
        possible_model = int(model.n_all)  # impl/scene.hpp:63-67
    else:
        possible_model = int(
            ((np.linalg.norm(np.asarray(model.cloud.tangent), axis=-1) > 0.7)
             & np.asarray(model.cloud.valid)).sum()
        )
    early_out_threshold = early_out_factor * possible_model

    matches: list[Match] = []
    rnd = 0
    while rnd < policy.max_rounds:  # safety valve; phases end the search
        # --- one find_parallel phase (impl/scene.hpp:108-240) ---
        n_left = int(
            (edge_valid_np & ~np.asarray(consumed) & ~np.asarray(fp)).sum()
        )
        outer_bound = adaptive_outer_bound(n_model, n_left, n_scene_edge, policy)
        if outer_bound == 0:
            break  # no eligible first points remain
        phase_rounds = max(1, -(-outer_bound // (policy.num_first_samples * dp_size)))
        stats["phases"] += 1
        phase_accepted = False
        phase_early_out = False
        if progress is not None:
            progress(0.0)
        for round_in_phase in range(phase_rounds):
            if rnd >= policy.max_rounds:
                break
            key = jax.random.fold_in(base_key, rnd)
            with profiler.section("round"):
                res, consumed, fp = round_fn(
                    model, prep, consumed, fp, key, jnp.float32(dist_thres),
                    jnp.float32(model_match_factor), mpack
                )
                jax.block_until_ready(res.accept)
            rnd += 1
            if progress is not None:
                progress((round_in_phase + 1) / phase_rounds)
            accept = np.asarray(res.accept)
            stats["rounds"] += 1
            stats["hypotheses_scored"] += int(res.hypotheses_scored)
            stats["finalists"] += accept.shape[0]
            stats["accepted"] += int(accept.sum())
            stats["join_overflow_max"] = max(
                stats.get("join_overflow_max", 0), int(res.join_overflow))
            if not accept.any():
                continue
            phase_accepted = True
            counts = np.asarray(res.count)
            order = np.argsort(-counts)
            for f in order:
                if not accept[f]:
                    continue
                t_inv = np.asarray(invert_rigid(res.transform[f]))
                new = np.asarray(res.new_corr[f])
                sidx = np.where(new)[0].astype(np.int32)
                midx = np.asarray(res.model_idx[f])[sidx]
                matches.append(
                    Match(
                        transform=t_inv,
                        scene_corrs=sidx,
                        model_corrs=midx,
                        signed_score=float(np.asarray(normalize_score(model, res.score[f]))),
                    )
                )
                if policy.early_out and counts[f] >= early_out_threshold:
                    phase_early_out = True
                if len(matches) >= policy.max_instances:
                    _publish_stats(stats, profiler)
                    return matches
            if phase_early_out:
                break  # impl/scene.hpp:341-347 — stop scanning this phase
        if not phase_accepted:
            break  # full no-match budget exhausted (impl/scene.hpp:70-73)
    _publish_stats(stats, profiler)
    return matches


def find_all_multi(
    models: list[CompiledModel],
    scene_cloud: cl.PointCloud,
    *,
    raycast_origins: np.ndarray | None = None,
    min_cast_score: float | None = None,
    point_radius: float | None = None,
    depth_tolerance: float | None = None,
    policy: SearchPolicy = DEFAULT_POLICY,
    prep: ScenePrep | None = None,
    mesh=None,
    **kwargs,
) -> list[list[Match]]:
    """Search several models in one scene (BASELINE config 5).

    Models search sequentially over a SHARED consumed-points mask (a scene
    point claimed by one model's match is unavailable to the others — the
    multi-model extension of the masking protocol at impl/scene.hpp:87-93).
    With ``raycast_origins``, each match is raycast-verified
    (verify/raycast.py): cast_score = matched visible model points /
    visible-from-any-origin model points (<= 1 by construction, fixing the
    reference formula's can-exceed-1 wart), and matches below
    ``min_cast_score`` are dropped (the reference's disabled OptiX
    verification, impl/scene.hpp:173-187, made live).

    ``prep`` reuses a caller-prepared scene (one prepare across all models
    and, in a serving loop, across scenes of one capacity bucket — see
    api.Matcher); ``mesh`` flows to both scene prep and every per-model
    search.  Returns one match list per model.
    """
    from triplet_match_tpu.verify.raycast import cast_visibility_multi

    if prep is None:
        prep = prepare_scene(scene_cloud, policy, mesh=mesh)
    n = prep.cloud.xyz.shape[0]
    consumed_points: np.ndarray | None = None
    all_matches: list[list[Match]] = []
    LAST_MULTI_SEARCH_STATS.clear()

    for model in models:
        if consumed_points is not None:
            patched = dataclasses.replace(
                prep.cloud, valid=prep.cloud.valid & ~jnp.asarray(consumed_points)
            )
            prep_m = ScenePrep(
                cloud=patched,
                tangent_mask=prep.tangent_mask & ~jnp.asarray(consumed_points),
                n_edge=prep.n_edge,
            )
        else:
            prep_m = prep
        t_search0 = time.perf_counter()
        matches = find_all(model, scene_cloud, policy=policy, prep=prep_m,
                           mesh=mesh, **kwargs)
        mstats = dict(LAST_SEARCH_STATS)
        mstats["search_s"] = round(time.perf_counter() - t_search0, 3)
        LAST_MULTI_SEARCH_STATS.append(mstats)

        if raycast_origins is not None:
            t_cast0 = time.perf_counter()
            res = float(model.resolution)
            pr = point_radius if point_radius is not None else res
            dt = depth_tolerance if depth_tolerance is not None else 2.0 * res
            kept = []
            for m in matches:
                vis = cast_visibility_multi(
                    np.asarray(raycast_origins, np.float32),
                    model.cloud.xyz, model.cloud.valid, jnp.asarray(m.transform),
                    prep.cloud.xyz, prep.cloud.valid, pr, dt,
                )
                from triplet_match_tpu.verify.raycast import cast_score_matched as _cs

                m.cast_score = float(_cs(vis, jnp.asarray(m.model_corrs)))
                if min_cast_score is None or m.cast_score >= min_cast_score:
                    kept.append(m)
            matches = kept
            mstats["raycast_s"] = round(time.perf_counter() - t_cast0, 3)

        if consumed_points is None:
            consumed_points = np.zeros(n, bool)
        for m in matches:
            consumed_points[m.scene_corrs] = True
        all_matches.append(matches)
    return all_matches


def instantiate(model: CompiledModel, match: Match, instantiate_all: bool = True) -> np.ndarray:
    """Place the model into the scene under a match transform.

    Analog of ``scene::instantiate`` (impl/scene.hpp:512-531).  The reference
    default returns an EMPTY cloud because it reads a locally-empty corr list
    unless instantiate_all=true (a vestigial bug, SURVEY §3.3); we default to
    the useful behavior and honor instantiate_all=False by using the match's
    model corrs.
    """
    xyz = np.asarray(model.cloud.xyz)
    if instantiate_all:
        # valid rows only: padded/finite-filtered filler rows are zeroed and
        # would otherwise appear as a garbage cluster at the pose translation
        idx = np.flatnonzero(np.asarray(model.cloud.valid))
    else:
        idx = match.model_corrs
    pts = xyz[idx]
    return pts @ match.transform[:3, :3].T + match.transform[:3, 3]
