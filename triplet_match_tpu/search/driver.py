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
from triplet_match_tpu.ops.curvature import edge_mask as edge_mask_op
from triplet_match_tpu.ops.curvature import principal_curvatures
from triplet_match_tpu.ops.knn import radius_neighbors
from triplet_match_tpu.refine.icp import icp_refine
from triplet_match_tpu.search.sampling import sample_firsts, sample_seconds
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


@partial(jax.jit, static_argnames=("policy", "chunk"))
def _edge_chunk(cloud: cl.PointCloud, start, *, policy: SearchPolicy, chunk: int):
    """Edge classification for one query slice against the full cloud."""
    from jax import lax

    from triplet_match_tpu.ops.knn import knn as knn_op

    q = lax.dynamic_slice_in_dim(cloud.xyz, start, chunk, axis=0)
    qn = lax.dynamic_slice_in_dim(cloud.normal, start, chunk, axis=0)
    qt = lax.dynamic_slice_in_dim(cloud.tangent, start, chunk, axis=0)
    qv = lax.dynamic_slice_in_dim(cloud.valid, start, chunk, axis=0)
    idx, _ = knn_op(q, cloud.xyz, cloud.valid, policy.curvature_k, block=512,
                    approx_candidates=True)
    nbr = cloud.normal[idx]
    dots = jnp.einsum("nkd,nd->nk", nbr, qn)
    proj = nbr - dots[..., None] * qn[:, None, :]
    demean = proj - jnp.mean(proj, axis=1, keepdims=True)
    cov = jnp.einsum("nkd,nke->nde", demean, demean)
    evs, _ = jnp.linalg.eigh(cov)
    pc_min = evs[..., 1]
    pc_max = evs[..., 2]
    ratio = jnp.where(pc_max > 0.0, pc_min / jnp.maximum(pc_max, 1e-30), jnp.inf)
    tnorm = jnp.linalg.norm(qt, axis=-1)
    return qv & (tnorm > policy.tangent_norm_threshold) & (ratio < policy.curvature_ratio_threshold)


def prepare_scene(cloud: cl.PointCloud, policy: SearchPolicy = DEFAULT_POLICY,
                  *, chunk_points: int = 131072) -> ScenePrep:
    """Per-scene preprocessing (impl/scene.hpp:41-58).

    Million-point scenes run the curvature pass in bounded device programs
    (the tunnel/runtime limits single-program wall time), chunked over
    query slices; small scenes run one fused program.
    """
    n = cloud.xyz.shape[0]
    if n <= 2 * chunk_points:
        return _prepare_scene_whole(cloud, policy)

    cloud = jax.jit(cl.finite_filter)(cloud)
    nchunks = -(-n // chunk_points)
    pad = nchunks * chunk_points - n
    if pad:
        cloud_p = jax.tree_util.tree_map(
            lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)), cloud
        )
    else:
        cloud_p = cloud
    parts = [
        _edge_chunk(cloud_p, jnp.int32(i * chunk_points), policy=policy, chunk=chunk_points)
        for i in range(nchunks)
    ]
    tm = jnp.concatenate(parts)[:n] & cloud.valid
    return ScenePrep(cloud=cloud, tangent_mask=tm, n_edge=jnp.sum(tm.astype(jnp.int32)))


class RoundResult(NamedTuple):
    transform: jax.Array  # [F, 4, 4] scene->model (pre-inversion)
    accept: jax.Array  # [F] bool
    new_corr: jax.Array  # [F, N] bool — newly claimed scene corrs (isres)
    model_idx: jax.Array  # [F, N] int32
    count: jax.Array  # [F] int32 total corrs from ICP finish_find
    score: jax.Array  # [F] float32 signed score (unnormalized)
    hypotheses_scored: jax.Array  # int32 diagnostics


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

    k1, k2 = jax.random.split(key)

    # --- sampling (impl/scene.hpp:131-166, 266-297) ---
    eligible_first = prep.tangent_mask & ~consumed & ~fp_mask & cloud.valid
    firsts = sample_firsts(k1, eligible_first, b1)
    # scoring neighborhood: nearest points of ANY kind (the project_ subset)
    nbr_idx, nbr_in_r = radius_neighbors(
        cloud.xyz[firsts.idx], cloud.xyz, cloud.valid, model.diameter, ks,
        block=min(b1, 256), approx_candidates=True,
    )
    # second-sample pool: nearest EDGE points within the model diameter.
    # The reference iterates the full diameter ball (impl/scene.hpp:273) and
    # skips non-edge points; a k-NN over all points under-reaches the pair
    # distance band in dense scenes (its radius shrinks with density), so
    # the pool is restricted to edge candidates — the only valid seconds.
    second_eligible = prep.tangent_mask & ~consumed & cloud.valid
    pool_idx, pool_in_r = radius_neighbors(
        cloud.xyz[firsts.idx], cloud.xyz, second_eligible, model.diameter,
        policy.second_pool, block=min(b1, 256), approx_candidates=True,
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
    mpairs, mvalid = query_pairs(model, feats, discretization, qcap)  # [B1,B2,Q,2]
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

        groups = sp.pack_groups(cloud, prep.tangent_mask, consumed, nbr_idx, nbr_in_r)
        rows = sp.poses_to_rows(ts.reshape(b1, b2 * qcap, 4, 4))
        if policy.two_phase_scoring and ks >= 256:
            s_pl, _ = sp.score_groups_two_phase(
                mpack, groups, rows, thres * thres,
                hyp_ok.reshape(b1, b2 * qcap),
                mode="count", pose_tile=16,
                coarse_stride=policy.two_phase_stride,
                keep_frac=policy.two_phase_keep_frac,
                interpret=policy.pallas_interpret,
            )
        else:
            s_pl, _ = sp.score_groups_pallas(
                mpack, groups, rows, thres * thres,
                mode="count", pose_tile=8, interpret=policy.pallas_interpret,
            )
        scores = jnp.where(hyp_ok.reshape(b1, b2 * qcap), s_pl, -1.0).reshape(-1)
    else:
        def per_first(args):
            ts_b, ok_b, nbrs, nbr_ok = args  # [B2*Q,4,4], [B2*Q], [Ks], [Ks]
            idx = jnp.broadcast_to(nbrs[None, :], (b2 * qcap, ks))
            iv = jnp.broadcast_to(nbr_ok[None, :], (b2 * qcap, ks))
            s, c, _, _ = _score_points(
                model, cloud, prep.tangent_mask, consumed, ts_b, idx, iv, thres,
                weighted_distance=policy.weighted_distance,
                negative_scores=policy.negative_scores,
            )
            return jnp.where(ok_b, s, -1.0)

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
    icp = jax.vmap(
        lambda t: icp_refine(
            model, cloud, prep.tangent_mask, consumed, t, dist_thres, max_icp_iterations,
            weighted_distance=policy.weighted_distance,
            negative_scores=policy.negative_scores,
            point_to_plane=policy.icp_point_to_plane,
        )
    )(t_best)
    t_fin = icp.transform
    corr_valid = icp.corrs.valid  # [F, N]
    corr_midx = icp.corrs.model_idx
    fin_counts = icp.corrs.count
    fin_scores = icp.corrs.score

    # --- greedy acceptance (impl/scene.hpp:193-237) ---
    order = jnp.argsort(-fin_counts)
    min_pts = jnp.floor(model_match_factor * model.n_edge.astype(jnp.float32)).astype(jnp.int32)
    min_pts_all = jnp.floor(model_match_factor * model.n_all.astype(jnp.float32)).astype(jnp.int32)

    def accept_step(used, f):
        cv = corr_valid[f]
        new = cv & ~used
        score_t = jnp.sum((new & prep.tangent_mask).astype(jnp.int32))
        score_all = jnp.sum(new.astype(jnp.int32))
        ok = (score_t >= min_pts) & (score_all >= min_pts_all)
        used = jnp.where(ok, used | cv, used)
        return used, (ok, new)

    _, (acc_ord, new_ord) = jax.lax.scan(accept_step, consumed, order)
    # un-permute back to finalist order
    inv_order = jnp.argsort(order)
    accept = acc_ord[inv_order]
    new_corr = new_ord[inv_order]

    consumed_next = consumed | jnp.any(new_corr & accept[:, None], axis=0)
    fp_next = fp_mask.at[first_idx].set(fp_mask[first_idx] | first_valid)

    result = RoundResult(
        transform=t_fin,
        accept=accept,
        new_corr=new_corr,
        model_idx=corr_midx,
        count=fin_counts,
        score=fin_scores,
        hypotheses_scored=n_hyp,
    )
    return result, consumed_next, fp_next


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


LAST_SEARCH_STATS: dict = {}


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
    dist_thres: float = 3.0,
    model_match_factor: float = 0.4,
    early_out_factor: float = 0.9,
    sample_params: SampleParams = DEFAULT_SAMPLE_PARAMS,
    discretization: DiscretizationParams = DEFAULT_DISCRETIZATION,
    policy: SearchPolicy = DEFAULT_POLICY,
    max_icp_iterations: int = 10,
    seed: int = 13,
    prep: ScenePrep | None = None,
) -> list[Match]:
    """Find all model instances in the scene.

    API analog of ``scene::find_all_parallel``
    (/root/reference/include/scene:47-48).  ``early_out_factor`` is accepted
    for signature parity; batched scoring replaces early-out so it has no
    effect (in the reference the normalized score can never reach the
    count-scaled threshold either — the gate is vestigial, impl/scene.hpp:341).
    Deterministic for a fixed seed (the reference is clock-seeded).
    """
    if prep is None:
        prep = prepare_scene(scene_cloud, policy)

    from triplet_match_tpu.utils.timer import Profiler

    profiler = Profiler()
    stats = {"rounds": 0, "hypotheses_scored": 0, "finalists": 0, "accepted": 0}

    use_pallas = policy.scorer == "pallas" or (
        policy.scorer == "auto" and jax.default_backend() == "tpu"
    )
    mpack = None
    if use_pallas:
        from triplet_match_tpu.search import score_pallas as sp

        mpack = sp.pack_model(model)  # host compaction; once per model

    round_fn = jax.jit(
        partial(
            search_round,
            discretization=discretization,
            sample_params=sample_params,
            policy=policy,
            max_icp_iterations=max_icp_iterations,
        )
    )

    n = prep.cloud.xyz.shape[0]
    consumed = jnp.zeros(n, bool)
    fp = jnp.zeros(n, bool)
    base_key = jax.random.PRNGKey(seed)

    matches: list[Match] = []
    for rnd in range(policy.max_rounds):
        key = jax.random.fold_in(base_key, rnd)
        with profiler.section("round", consumed):
            res, consumed, fp = round_fn(
                model, prep, consumed, fp, key, jnp.float32(dist_thres),
                jnp.float32(model_match_factor), mpack
            )
            jax.block_until_ready(res.accept)
        accept = np.asarray(res.accept)
        stats["rounds"] += 1
        stats["hypotheses_scored"] += int(res.hypotheses_scored)
        stats["finalists"] += accept.shape[0]
        stats["accepted"] += int(accept.sum())
        if not accept.any():
            _publish_stats(stats, profiler)
            break
        order = np.argsort(-np.asarray(res.count))
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
            if len(matches) >= policy.max_instances:
                _publish_stats(stats, profiler)
                return matches
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
    **kwargs,
) -> list[list[Match]]:
    """Search several models in one scene (BASELINE config 5).

    Models search sequentially over a SHARED consumed-points mask (a scene
    point claimed by one model's match is unavailable to the others — the
    multi-model extension of the masking protocol at impl/scene.hpp:87-93).
    With ``raycast_origins``, each match is raycast-verified
    (verify/raycast.py): cast_score = matched / visible-from-any-origin, and
    matches below ``min_cast_score`` are dropped (the reference's disabled
    OptiX verification, impl/scene.hpp:173-187, made live).

    Returns one match list per model.
    """
    from triplet_match_tpu.verify.raycast import cast_visibility_multi

    prep = prepare_scene(scene_cloud, policy)
    n = prep.cloud.xyz.shape[0]
    consumed_points: np.ndarray | None = None
    all_matches: list[list[Match]] = []

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
        matches = find_all(model, scene_cloud, policy=policy, prep=prep_m, **kwargs)

        if raycast_origins is not None:
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
                from triplet_match_tpu.verify.raycast import cast_score as _cs

                m.cast_score = float(_cs(vis, float(len(m.scene_corrs))))
                if min_cast_score is None or m.cast_score >= min_cast_score:
                    kept.append(m)
            matches = kept

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
    idx = np.arange(xyz.shape[0]) if instantiate_all else match.model_corrs
    pts = xyz[idx]
    return pts @ match.transform[:3, :3].T + match.transform[:3, 3]
