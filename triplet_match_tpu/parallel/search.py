"""Multi-chip sharded search.

Two shardings, mirroring SURVEY §2's parallelism table:

* **Hypothesis data parallelism** (the ``std::async`` chunking analog,
  /root/reference/include/impl/scene.hpp:146-166): every chip runs the
  sampling + scoring body with a per-chip folded PRNG key (its own RANSAC
  chunk), keeps its local top-F finalists, and the finalists are
  all-gathered over ICI for replicated ICP + acceptance — the exact
  structure of the reference's fan-out/join, with the mutex-guarded
  ``fp_mask_`` merge replaced by a deterministic OR-reduce of first-sample
  masks.

* **Scene-point sharding** (the long-context analog, SURVEY §5): for
  scenes too large per chip, ``finish_find`` shards scene points across the
  mesh; correspondences stay shard-local and score/count reduce with psum.
"""

from __future__ import annotations

import jax
from jax import lax
from jax.sharding import PartitionSpec as P

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.index.model import CompiledModel
from triplet_match_tpu.search.driver import (
    ScenePrep,
    finalize_round,
    hypothesize_and_score,
)
from triplet_match_tpu.search.score import DenseCorrs, finish_find


def search_round_dp(
    mesh,
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
    """One search round, hypothesis-parallel over the mesh.

    Each chip samples ``policy.num_first_samples`` of its own firsts, so
    the effective outer RANSAC batch is ``B1 * n_chips`` per round.
    Returns (RoundResult, consumed', fp') — all replicated.
    """
    axis = mesh.axis_names[0]
    fin = policy.finalists

    def per_chip(model, prep, consumed, fp_mask, key, mpack):
        me = lax.axis_index(axis)
        key_d = jax.random.fold_in(key, me)
        ts_flat, scores, first_idx, first_valid, n_hyp = hypothesize_and_score(
            model, prep, consumed, fp_mask, key_d, dist_thres, mpack,
            discretization=discretization, sample_params=sample_params, policy=policy,
        )
        _, best = lax.top_k(scores, fin)
        t_local = ts_flat[best]  # [F, 4, 4]
        s_local = scores[best]
        # join over ICI: gather finalists + first-sample marks from all chips
        t_all = lax.all_gather(t_local, axis).reshape(-1, 4, 4)
        s_all = lax.all_gather(s_local, axis).reshape(-1)
        fi_all = lax.all_gather(first_idx, axis).reshape(-1)
        fv_all = lax.all_gather(first_valid, axis).reshape(-1)
        n_hyp_all = lax.psum(n_hyp, axis)
        return t_all, s_all, fi_all, fv_all, n_hyp_all

    shard = jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    t_all, s_all, fi_all, fv_all, n_hyp = shard(model, prep, consumed, fp_mask, key, mpack)

    # keep the global top-F among the gathered per-chip finalists
    _, best = lax.top_k(s_all, fin)
    t_best = t_all[best]

    return finalize_round(
        model, prep, consumed, fp_mask, t_best, fi_all, fv_all, n_hyp,
        dist_thres, model_match_factor,
        policy=policy, max_icp_iterations=max_icp_iterations,
    )


def finish_find_sp(
    mesh,
    model: CompiledModel,
    scene,
    tangent_mask: jax.Array,
    consumed: jax.Array,
    t: jax.Array,
    dist_thres,
) -> DenseCorrs:
    """finish_find with scene points sharded across the mesh.

    Scene arrays shard along the point axis (must be divisible by the mesh
    size); the model (LUT + cloud) is replicated.  Per-point correspondence
    outputs stay sharded; scalar score/count psum over ICI.
    """
    axis = mesh.axis_names[0]

    def per_chip(model, scene, tangent_mask, consumed, t):
        # finish_find owns the cross-shard reduction (score/count psum over
        # axis_name) — same path search2d's sharded polish uses
        return finish_find(model, scene, tangent_mask, consumed, t,
                           dist_thres, axis_name=axis)

    shard = jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=DenseCorrs(model_idx=P(axis), valid=P(axis), score=P(), count=P()),
        check_vma=False,
    )
    return shard(model, scene, tangent_mask, consumed, t)
