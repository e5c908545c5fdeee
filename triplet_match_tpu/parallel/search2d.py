"""2-D / 3-D mesh search: hypothesis data parallelism x scene sharding.

Extends the 1-D shardings of ``parallel/search.py`` to a ("dp", "sp") mesh,
optionally prefixed by a "dcn" multi-slice axis:

* the **dp** axis replays the reference's ``std::async`` chunking
  (impl/scene.hpp:146-166) — each dp slice samples its own RANSAC chunk
  with a folded key and finalists join over ICI;
* the **sp** axis shards every scene-length array (positions, normals,
  tangents, masks) across devices — per-device scene memory drops by the
  sp extent, the "multi-host scenes" story of SURVEY §2/§5.  Within a dp
  slice, sp shards cooperate on the SAME sample set;
* the optional **dcn** axis models multiple TPU slices joined by
  data-center network: each slice runs its own (dp x sp) search on extra
  RANSAC chunks, and the finalist join is HIERARCHICAL — top-F over ICI
  within the slice first, then one small all_gather of F poses per slice
  over DCN — so the slow cross-slice hop carries O(F * 16) floats per
  round, never scene data.  Mesh axis order ("dcn", "dp", "sp") keeps the
  fast collectives on the minor (intra-slice) axes.

Cooperation without replicating the scene requires every random choice to
be a pure function of (key, global point index): ``sampling.hash_uniform``
priorities make first sampling and ball sampling shard-invariant, so a
1x1 mesh, an 8x1 mesh, and a 2x4 mesh draw byte-identical samples for the
same key (tested in tests/test_parallel2d.py).

Structure of one round (per device, under shard_map):
  1. firsts:   local hash-priority top-B1 over the shard -> all_gather(sp)
               -> global top-B1 (attributes carried, no cross-shard gather)
  2. balls:    ops.knn.radius_sample on the LOCAL shard with global-index
               priorities -> per-first top-K merge over sp, carrying the
               8 scene channels the Pallas kernel consumes
  3. pairs:    gates/features/query/base_transform on the replicated
               [B1, B2] sample arrays (model index is replicated)
  4. scoring:  fused Pallas kernel on the merged channel groups
  5. join:     local top-F finalists -> all_gather(dp) -> global top-F
  6. finalize: ICP + greedy acceptance with psum(sp) reductions
               (finish_find and weighted_kabsch take axis_name).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.transforms import base_transform
from triplet_match_tpu.features import pairfeat as pf
from triplet_match_tpu.index.model import CompiledModel, query_pairs
from triplet_match_tpu.ops.knn import radius_sample
from triplet_match_tpu.refine.icp import icp_refine
from triplet_match_tpu.search import score_pallas as sp
from triplet_match_tpu.search.driver import RoundResult, _rank_on_all
from triplet_match_tpu.search.sampling import hash_uniform

DCN_AXIS = "dcn"
DP_AXIS = "dp"
SP_AXIS = "sp"

_INF = np.float32(3.0e38)


def make_mesh_2d(dp: int, sp: int) -> Mesh:
    import numpy as np

    devs = jax.devices()
    assert len(devs) >= dp * sp, f"need {dp * sp} devices, have {len(devs)}"
    return Mesh(np.array(devs[: dp * sp]).reshape(dp, sp), (DP_AXIS, SP_AXIS))


def make_mesh_3d(dcn: int, dp: int, sp: int) -> Mesh:
    """(slices, chips-per-slice-dp, chips-per-slice-sp) mesh.

    On real hardware pass devices so that the LAST two axes stay within a
    slice (ICI) and the first crosses slices (DCN); with virtual CPU
    devices the layout is representational.
    """
    import numpy as np

    devs = jax.devices()
    n = dcn * dp * sp
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]).reshape(dcn, dp, sp), (DCN_AXIS, DP_AXIS, SP_AXIS))


def _merge_sp_topk(prio, k: int, *vals):
    """Merge per-shard candidate lists into the global top-k by priority.

    prio: [..., kl] local candidate priorities (ascending = better).
    vals: arrays [..., kl] or [..., kl, C] carried alongside.
    Returns (prio [..., k], vals') — identical on every sp shard.
    """
    pr = lax.all_gather(prio, SP_AXIS, axis=prio.ndim - 1, tiled=True)
    ax = prio.ndim - 1
    # scenes so small that sp * local_k < k must not crash top_k — take the
    # gathered width and pad back to the static k with _INF priorities
    # (callers mask on prio < _INF)
    kk = min(k, pr.shape[ax])
    neg, slots = lax.top_k(-pr, kk)
    out = []
    for v in vals:
        vg = lax.all_gather(v, SP_AXIS, axis=ax, tiled=True)
        sl = slots.reshape(slots.shape + (1,) * (v.ndim - prio.ndim))
        out.append(jnp.take_along_axis(vg, jnp.broadcast_to(sl, slots.shape + v.shape[prio.ndim:]), axis=ax))
    merged = -neg
    if kk < k:
        pad = k - kk
        merged = jnp.concatenate(
            [merged, jnp.full(merged.shape[:ax] + (pad,), _INF, merged.dtype)], axis=ax)
        out = [
            jnp.concatenate(
                [v, jnp.zeros(v.shape[:ax] + (pad,) + v.shape[ax + 1:], v.dtype)], axis=ax)
            for v in out
        ]
    return merged, out


class _Samples(NamedTuple):
    prio: jax.Array
    gidx: jax.Array
    xyz: jax.Array
    tangent: jax.Array


def search_round_2d_prep(mesh, model, prep, consumed, fp_mask, key,
                         dist_thres, model_match_factor, mpack=None, **kw):
    """ScenePrep-signature adapter matching driver.search_round /
    parallel.search.search_round_dp, for use as a find_all round backend."""
    return search_round_2d(
        mesh, model, prep.cloud, prep.tangent_mask, consumed, fp_mask, key,
        dist_thres, model_match_factor, mpack, **kw
    )


def search_round_2d(
    mesh: Mesh,
    model: CompiledModel,
    cloud,  # PointCloud, point axis sharded over SP_AXIS
    tangent_mask: jax.Array,
    consumed: jax.Array,
    fp_mask: jax.Array,
    key: jax.Array,
    dist_thres,
    model_match_factor,
    mpack,
    *,
    discretization: DiscretizationParams,
    sample_params: SampleParams,
    policy: SearchPolicy,
    max_icp_iterations: int,
    replicate_outputs: bool = False,
):
    """One search round on a (dp, sp) mesh.

    Returns (RoundResult, consumed', fp') — per-point fields sharded over
    sp, everything else replicated.  Each dp chunk folds its dp index into
    the key (``fold_in(key, dp_i)``), so a (1, 1) mesh reproduces the
    single-chip ``search_round`` run with ``fold_in(key, 0)`` — NOT with
    the raw key — byte-for-byte on sampling and within float-reduction
    tolerance on poses (tests/test_parallel2d.py pins this).

    ``replicate_outputs=True`` all-gathers the sp-sharded outputs
    (new_corr/model_idx/consumed/fp) over the sp axis so every output is
    fully replicated — required on MULTI-CONTROLLER runtimes, where
    driver.find_all's host loop reads these with np.asarray and a
    non-fully-addressable sharded array would raise.  One [F, N]-bool +
    [F, N]-int32 + 2x[N]-bool gather per round, riding ICI.
    """
    b1, b2 = policy.num_first_samples, policy.num_second_samples
    qcap = policy.query_cap
    ks = policy.score_neighbors
    fin = policy.finalists
    has_dcn = DCN_AXIS in mesh.axis_names
    dp_ext = mesh.shape[DP_AXIS]

    lower = model.diameter * sample_params.min_diameter_factor
    upper = model.diameter * sample_params.max_diameter_factor

    def per_device(model, mpack, cloud, tangent_mask, consumed, fp_mask, key,
                   dist_thres, model_match_factor):
        dp_i = lax.axis_index(DP_AXIS)
        if has_dcn:
            # every (slice, dp) pair is an independent RANSAC chunk
            dp_i = lax.axis_index(DCN_AXIS) * dp_ext + dp_i
        sp_i = lax.axis_index(SP_AXIS)
        nl = cloud.xyz.shape[0]
        offset = sp_i * nl
        gidx = offset + jnp.arange(nl, dtype=jnp.int32)
        thres = jnp.float32(dist_thres) * model.resolution

        key_d = jax.random.fold_in(key, dp_i)
        k1, k2, k3, k4 = jax.random.split(key_d, 4)

        # --- 1. firsts: local top-B1 by hash priority, merged over sp ---
        eligible_first = tangent_mask & ~consumed & ~fp_mask & cloud.valid
        pr1 = jnp.where(eligible_first, hash_uniform(k1, gidx, salt=1), _INF)
        kl = min(b1, nl)
        negl, lidx = lax.top_k(-pr1, kl)
        f_local = _Samples(-negl, gidx[lidx], cloud.xyz[lidx], cloud.tangent[lidx])
        fpr, (f_gidx, f_xyz, f_tan) = _merge_sp_topk(
            f_local.prio, b1, f_local.gidx, f_local.xyz, f_local.tangent
        )
        firsts_valid = fpr < _INF

        # --- 2. neighborhood + pool balls on the local shard, merged ---
        # scoring ball: any-kind points (impl/scene.hpp:273,432)
        nb_idx, nb_ok = radius_sample(
            k3, f_xyz, cloud.xyz, cloud.valid, model.diameter, ks,
            block=min(b1, 256), prio=hash_uniform(k3, gidx),
        )
        nb_pr = jnp.where(nb_ok, hash_uniform(k3, gidx[nb_idx]), _INF)
        # channels the kernel consumes — shared layout home
        ch = sp.group_channels(cloud, tangent_mask, consumed, nb_idx, nb_ok,
                               samples_on_all=_rank_on_all(policy))  # [B1, K, 8]
        _, (ch_m,) = _merge_sp_topk(nb_pr, ks, ch)
        groups = jnp.swapaxes(ch_m, 1, 2)  # [B1, 8, K]

        # second pool: edge candidates (impl/scene.hpp:284-290)
        second_eligible = tangent_mask & ~consumed & cloud.valid
        pl_idx, pl_ok = radius_sample(
            k4, f_xyz, cloud.xyz, second_eligible, model.diameter,
            policy.second_pool, block=min(b1, 256), prio=hash_uniform(k4, gidx),
        )
        pl_pr = jnp.where(pl_ok, hash_uniform(k4, gidx[pl_idx]), _INF)
        pl_ch = jnp.concatenate(
            [cloud.xyz[pl_idx], cloud.tangent[pl_idx]], axis=-1
        )  # [B1, P, 6]
        pl_prm, (pl_chm, pl_gidx) = _merge_sp_topk(
            pl_pr, policy.second_pool, pl_ch, gidx[pl_idx]
        )
        pool_ok = pl_prm < _INF

        # --- seconds: B2 distinct uniform draws from the merged pool ---
        not_self = pl_gidx != f_gidx[:, None]
        sec_elig = pool_ok & not_self & firsts_valid[:, None]
        g = jax.random.gumbel(k2, sec_elig.shape)
        gs = jnp.where(sec_elig, g, -jnp.inf)
        top, slots = lax.top_k(gs, b2)  # [B1, B2]
        take = lambda a: jnp.take_along_axis(a, slots[..., None], axis=1)
        p1 = take(pl_chm[..., 0:3])
        t1 = take(pl_chm[..., 3:6])
        sec_valid = jnp.take_along_axis(sec_elig, slots, axis=1) & jnp.isfinite(top)

        # --- 3. pair gates -> features -> model query -> hypotheses ---
        p0 = f_xyz[:, None, :]
        t0 = f_tan[:, None, :]
        gates = pf.pair_gates(p0, p1, t0, lower, upper, policy.pair_parallel_epsilon)
        feats = pf.pair_feature(p0, p1, t0, t1)
        fval = pf.feature_valid(feats, model.bounds_min, model.bounds_max)
        pair_ok = sec_valid & gates & fval

        mpairs, mvalid = query_pairs(model, feats, discretization, qcap,
                                     limit=policy.query_limit)
        m_i, m_j = mpairs[..., 0], mpairs[..., 1]
        hyp_ok = pair_ok[..., None] & mvalid
        ts = base_transform(
            jnp.broadcast_to(p0[:, :, None, :], (b1, b2, qcap, 3)),
            jnp.broadcast_to(p1[:, :, None, :], (b1, b2, qcap, 3)),
            jnp.broadcast_to(t0[:, :, None, :], (b1, b2, qcap, 3)),
            model.cloud.xyz[m_i],
            model.cloud.xyz[m_j],
            model.cloud.tangent[m_i],
        )
        if sample_params.force_up:
            hyp_ok = hyp_ok & (jnp.abs(1.0 - ts[..., 2, 2]) <= 0.01)

        # --- 4. fused kernel scoring on the merged groups (shared
        # policy-driven dispatch: score_pallas.rank_groups) ---
        rows = sp.poses_to_rows(ts.reshape(b1, b2 * qcap, 4, 4))
        okg = hyp_ok.reshape(b1, b2 * qcap)
        scores = sp.rank_groups(mpack, groups, rows, thres * thres,
                                okg, policy).reshape(-1)
        # hyp_ok is replicated across sp (built from merged samples), so the
        # total only reduces over dp
        n_hyp = jnp.sum(hyp_ok.astype(jnp.int32))

        # --- 5. finalist join: ICI within the slice, then (optionally) one
        # small DCN hop carrying F poses per slice ---
        _, best = lax.top_k(scores, fin)
        t_local = ts.reshape(-1, 4, 4)[best]
        s_local = scores[best]
        t_all = lax.all_gather(t_local, DP_AXIS).reshape(-1, 4, 4)
        s_all = lax.all_gather(s_local, DP_AXIS).reshape(-1)
        _, gbest = lax.top_k(s_all, fin)
        t_best = t_all[gbest]
        if has_dcn:
            t_x = lax.all_gather(t_best, DCN_AXIS).reshape(-1, 4, 4)
            s_x = lax.all_gather(s_all[gbest], DCN_AXIS).reshape(-1)
            _, xbest = lax.top_k(s_x, fin)
            t_best = t_x[xbest]
        hyp_axes = (DCN_AXIS, DP_AXIS) if has_dcn else DP_AXIS
        n_hyp_all = lax.psum(n_hyp, hyp_axes)

        # --- 6. ICP + greedy acceptance + gated tight polish, shared with
        # the single-chip path (driver.accept_and_polish) — axis_name=sp
        # makes every count/claim reduction psum over the scene shards;
        # accept is replicated (psum'd scores), so every device takes the
        # same branches and the in-branch sp collectives stay aligned
        from triplet_match_tpu.search.driver import accept_and_polish

        (t_fin, accept, new_corr, corr_midx, fin_counts, fin_scores,
         consumed_next, join_overflow) = accept_and_polish(
            model, cloud, tangent_mask, consumed, t_best, dist_thres,
            model_match_factor, policy=policy,
            max_icp_iterations=max_icp_iterations, axis_name=SP_AXIS,
        )

        # fp marks this shard's sampled firsts (global -> local index)
        f_local_idx = f_gidx - offset
        in_shard = (f_local_idx >= 0) & (f_local_idx < nl) & firsts_valid
        # every (dcn, dp) chunk sampled its own firsts; OR-reduce marks
        fp_marks = jnp.zeros(nl, jnp.int32).at[jnp.clip(f_local_idx, 0, nl - 1)].max(
            in_shard.astype(jnp.int32)
        )
        fp_next = fp_mask | (lax.psum(fp_marks, hyp_axes) > 0)

        if replicate_outputs:
            # multi-controller: the host loop reads these with np.asarray,
            # which requires fully-addressable (replicated) arrays
            new_corr = lax.all_gather(new_corr, SP_AXIS, axis=1, tiled=True)
            corr_midx = lax.all_gather(corr_midx, SP_AXIS, axis=1, tiled=True)
            consumed_next = lax.all_gather(consumed_next, SP_AXIS, tiled=True)
            fp_next = lax.all_gather(fp_next, SP_AXIS, tiled=True)

        result = RoundResult(
            transform=t_fin,
            accept=accept,
            new_corr=new_corr,
            model_idx=corr_midx,
            count=fin_counts,
            score=fin_scores,
            hypotheses_scored=n_hyp_all,
            join_overflow=join_overflow,
        )
        return result, consumed_next, fp_next

    pt_spec = P() if replicate_outputs else P(SP_AXIS)
    corr_spec = P() if replicate_outputs else P(None, SP_AXIS)
    shard = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(SP_AXIS), P(SP_AXIS), P(SP_AXIS), P(SP_AXIS), P(), P(), P()),
        out_specs=(
            RoundResult(
                transform=P(), accept=P(), new_corr=corr_spec,
                model_idx=corr_spec, count=P(), score=P(),
                hypotheses_scored=P(), join_overflow=P(),
            ),
            pt_spec,
            pt_spec,
        ),
        check_vma=False,
    )
    return shard(model, mpack, cloud, tangent_mask, consumed, fp_mask, key,
                 jnp.float32(dist_thres), jnp.float32(model_match_factor))
