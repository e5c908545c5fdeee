"""Batched correspondence-ICP refinement.

Mirrors ``scene::icp_`` (/root/reference/include/impl/scene.hpp:369-404):
score the pose over all scene points at a relaxed threshold (2 x dist_thres),
fit a rigid transform to the correspondences with umeyama (no scale), rescore,
and iterate while the correspondence count does not shrink (up to
max_iterations).  Fewer than 3 correspondences stops immediately.

The reference refines one candidate at a time on the host; here candidates
refine in parallel (vmap) with a ``lax.while_loop``, and the correspondence
fit is a weighted Kabsch over dense masked arrays.  This subsumes the
OpenCL ``icp_projection``/``icp_correlation`` kernels (opencl/icp.cl:1-86).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from triplet_match_tpu.core.transforms import weighted_kabsch
from triplet_match_tpu.index.model import CompiledModel
from triplet_match_tpu.search.score import DenseCorrs, finish_find


class IcpResult(NamedTuple):
    transform: jax.Array  # [4, 4] scene->model
    corrs: DenseCorrs
    iterations: jax.Array  # int32


def icp_refine(
    model: CompiledModel,
    scene,
    tangent_mask: jax.Array,
    consumed: jax.Array,
    t0: jax.Array,
    dist_thres,
    max_iterations: int,
    tight_iterations: int = 2,
    weighted_distance: bool = False,
    negative_scores: bool = False,
    point_to_plane: bool = False,
    samples_on_all: bool = True,
    axis_name: str | None = None,
) -> IcpResult:
    """Refine a single pose (use vmap for a batch).

    After the reference-faithful relaxed loop, ``tight_iterations`` extra
    Kabsch steps run at the *unrelaxed* threshold.  This is a deliberate
    improvement over the reference: the 2x gate admits clutter points near
    the model surface which bias the final pose by several mm; the tight
    polish removes most of that bias without changing which matches are
    accepted (correspondences are re-derived at the relaxed threshold at
    the end, preserving acceptance-count semantics).
    """
    relaxed = 2.0 * dist_thres  # impl/scene.hpp:373,395

    def _ff(t, thres, exact=False):
        return finish_find(model, scene, tangent_mask, consumed, t, thres, exact=exact,
                           weighted_distance=weighted_distance, negative_scores=negative_scores,
                           samples_on_all=samples_on_all, axis_name=axis_name)

    if max_iterations == 0:
        # impl/scene.hpp:371 returns the match untouched — its corrs came
        # from the caller's finish_find at the UNRELAXED threshold.  Using
        # the relaxed gate here would inflate acceptance counts ~2x-gate-wide
        # on the no-ICP path.
        return IcpResult(t0, _ff(t0, dist_thres), jnp.int32(0))

    best = _ff(t0, relaxed)

    def cond(state):
        t_best, corrs, it, done = state
        return ~done & (it < max_iterations)

    def body(state):
        t_best, corrs, it, _ = state
        w = corrs.valid.astype(jnp.float32)
        t_new = weighted_kabsch(scene.xyz, model.cloud.xyz[corrs.model_idx], w,
                                axis_name=axis_name)
        proj = _ff(t_new, relaxed)
        improved = proj.count >= corrs.count  # strict shrink stops (impl/scene.hpp:396)
        t_next = jnp.where(improved, t_new, t_best)
        corrs_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(improved, (1,) * a.ndim) if a.ndim else improved, a, b
            ),
            proj,
            corrs,
        )
        return (t_next, corrs_next, it + 1, ~improved)

    too_few = best.count < 3  # impl/scene.hpp:381
    t_fin, corrs_fin, iters, _ = lax.while_loop(
        cond, body, (t0, best, jnp.int32(0), too_few)
    )

    if tight_iterations > 0:
        t_fin = tight_polish(
            model, scene, tangent_mask, consumed, t_fin, dist_thres,
            tight_iterations,
            weighted_distance=weighted_distance, negative_scores=negative_scores,
            point_to_plane=point_to_plane, samples_on_all=samples_on_all,
            axis_name=axis_name,
        )
        corrs_fin = _ff(t_fin, relaxed)

    return IcpResult(t_fin, corrs_fin, iters)


def tight_polish(
    model: CompiledModel,
    scene,
    tangent_mask: jax.Array,
    consumed: jax.Array,
    t0: jax.Array,
    dist_thres,
    iterations: int = 2,
    weighted_distance: bool = False,
    negative_scores: bool = False,
    point_to_plane: bool = False,
    samples_on_all: bool = True,
    orientation_weight: bool = False,
    anneal: float = 1.0,
    edges_only: bool = False,
    point_to_line_at_floor: bool = False,
    axis_name: str | None = None,
) -> jax.Array:
    """Extra Kabsch steps at the UNRELAXED threshold with exact
    (LUT-seeded) correspondences — removes the clutter bias the 2x gate
    admits and the half-voxel LUT quantization from the final pose.

    A deliberate improvement over the reference (whose ICP stops at the
    relaxed gate): it changes only the reported transform, never which
    matches are accepted, so the search gates it on acceptance (the no-match
    confirmation rounds skip it entirely — finalize_round).

    Unconditional per step: the relaxed corr count slightly *prefers* the
    clutter-biased pose, so count-gating would reject the better fit.
    Degenerate (<3 corr) steps are no-ops.

    ``orientation_weight``: weight each correspondence by
    ``|scene_dir . model_dir|`` (the scorer's own orientation term,
    impl/scene.hpp:430 — tangent for edge points, normal for surface).
    Clutter sheets crossing the model surface at an angle are downweighted
    by the dihedral cosine, true corrs keep ~full weight; measured ~20%
    lower residual bias on the crossing-sheet study
    (tests/test_icp_clutter.py).

    ``anneal``: per-iteration threshold factor — iteration i runs at
    ``dist_thres * max(anneal**i, 1/16)``.  In dense touching fog the
    in-band clutter count AND its mean offset both scale with the band
    width, so the pose bias shrinks ~quadratically as the band tightens,
    while true correspondences (residual ~ scene noise after the first
    step) survive every tightening.  1.0 (legacy) keeps the fixed
    unrelaxed band; the 1/16 floor keeps the band above typical scene
    noise at any iteration count.

    ``point_to_line_at_floor``: run the hybrid Gauss-Newton fit
    (``gauss_newton_pose_step`` — edge corrs constrained perpendicular to
    the model tangent, surface corrs along normals) on the iterations
    whose annealed band has reached within 2x of the 1/16 floor, and the
    point-to-point Kabsch everywhere else.  Edge correspondences are
    nearest SAMPLES of the model's edge curves, so the point-to-point fit
    carries the along-edge sampling phase and the full along-edge error
    of mis-associated neighbor samples — projecting that axis out of the
    normal equations removes the ~0.15-0.5 mm sampling floor of the edge
    anchor (scripts/study_p2l_polish.py: worst 2.94 -> 0.27 mm with
    independently-sampled instances).  Gating on the floor keeps the
    wide-band iterations point-to-point, where cross-edge associations
    (a corner point grabbing the perpendicular edge) would otherwise
    donate wrong constraint planes; the floor-gated schedule measures
    identical precision to GN-every-step on every study seed.  Inert
    when ``anneal=1.0`` (the band never reaches the floor).
    ``point_to_plane`` (the legacy global knob) runs GN on EVERY step.

    ``edges_only``: fit each step on tangent-bearing scene correspondences
    only.  At the densest fog regimes the annealing is not enough — the
    in-band fog mass tracks the band as it tightens and the fit settles in
    a fog-shifted attractor (6.3 mm / 2.6 deg at the 4M envelope edge).
    Fog has no tangents, so an edge-gated fit is immune at any band width,
    and the first iteration's full ``dist_thres`` band re-captures true
    edges from several mm away.  The gate uses the RAW provided tangents
    (``|scene.tangent| > 0.7``), not the curvature-gated detection mask:
    detection validates ranking/acceptance eligibility, but its curvature
    neighborhoods are exactly what dense fog contaminates (343/600
    instance edges survive detection at 60k fog, fewer at 4M — the
    detection-starved anchor measured 1.30 mm / 0.91 deg,
    evidence_r5/scaling_r5b), while the dataset's own tangent claim is
    density-independent.  Steps with fewer than 12 in-band edge corrs
    fall back to all-point weights (degenerate or edge-poor geometries
    keep the legacy behavior).
    """

    if iterations <= 0:
        # static no-op: a zero-iteration schedule would still TRACE the
        # fori_loop body, whose thres_sched[i] gather is out of bounds on
        # a size-0 schedule (latent until tight_icp_iterations=0 met an
        # accepting round — found by scripts/debug_polish_hw.py)
        return t0

    if edges_only:
        # the raw-tangent mask replaces the curvature-gated detection mask
        # for the WHOLE polish (correspondence direction choice AND the
        # fit gate) — the polish is then independent of detection, which
        # dense fog starves (see docstring)
        tangent_mask = jnp.linalg.norm(scene.tangent, axis=-1) > 0.7
        raw_edges = tangent_mask.astype(jnp.float32)

    def _ff(t, thres, exact=False):
        return finish_find(model, scene, tangent_mask, consumed, t, thres, exact=exact,
                           weighted_distance=weighted_distance, negative_scores=negative_scores,
                           samples_on_all=samples_on_all, axis_name=axis_name)

    factors = jnp.maximum(
        jnp.float32(anneal) ** jnp.arange(iterations, dtype=jnp.float32),
        jnp.float32(1.0 / 16.0))
    thres_sched = jnp.asarray(dist_thres, jnp.float32) * factors

    def tight_body(i, t):
        corrs = _ff(t, thres_sched[i], exact=True)
        w = corrs.valid.astype(jnp.float32)
        if edges_only:
            we = w * raw_edges
            cnt_e = jnp.sum(we)
            if axis_name is not None:
                cnt_e = lax.psum(cnt_e, axis_name)
            w = jnp.where(cnt_e >= 12.0, we, w)
        if orientation_weight:
            midx_o = corrs.model_idx
            ref = jnp.where(tangent_mask[:, None], scene.tangent, scene.normal)
            # precision-pinned: default TPU matmul is bf16 — fine for a
            # weight, but pin it anyway for determinism across backends
            tref = jnp.matmul(ref, t[:3, :3].T,
                              precision=jax.lax.Precision.HIGHEST)
            mtan_o = model.cloud.tangent[midx_o]
            is_tan_o = jnp.linalg.norm(mtan_o, axis=-1) > 0.7
            ref_n = jnp.where(is_tan_o[:, None], mtan_o, model.cloud.normal[midx_o])
            w = w * jnp.abs(jnp.sum(tref * ref_n, axis=-1))
        if point_to_plane or point_to_line_at_floor:
            # hybrid Gauss-Newton: point-to-plane for surface corrs,
            # perpendicular-to-tangent for edge corrs — unbiased by the
            # tangential sliding of sampled surfaces (beats the
            # reference's point-to-point umeyama under noise)
            from triplet_match_tpu.core.transforms import (
                gauss_newton_pose_step, transform_points,
            )

            src = transform_points(t, scene.xyz)
            midx = corrs.model_idx
            mtan = model.cloud.tangent[midx]
            is_edge = jnp.linalg.norm(mtan, axis=-1) > 0.7
            m_dir = jnp.where(is_edge[:, None], mtan, model.cloud.normal[midx])
            m_dir = m_dir / jnp.maximum(
                jnp.linalg.norm(m_dir, axis=-1, keepdims=True), 1e-12
            )
            upd = gauss_newton_pose_step(
                src, model.cloud.xyz[midx], m_dir, is_edge, w,
                axis_name=axis_name,
            )
            # precision-pinned: a default-precision (bf16 on TPU) 4x4
            # compose injects ~|t|*2^-9 ≈ 3 mm of translation error and
            # ~0.2-0.5 deg of rotation error PER STEP — the round-5
            # hardware regression (2M seed 1: 0.078 mm p2p vs 4.17 mm
            # p2l, evidence_r5/diag2m_s1_*) while every CPU replay (f32
            # default matmuls) showed GN better
            t_gn = jnp.matmul(upd, t, precision=jax.lax.Precision.HIGHEST)
            if point_to_plane:
                t_new = t_gn
            else:
                # floor-gated: GN only once the annealed band is within
                # 2x of the 1/16 floor; wide-band steps stay
                # point-to-point (cross-edge associations at wide bands
                # donate wrong constraint planes — see docstring)
                t_kab = weighted_kabsch(
                    scene.xyz, model.cloud.xyz[corrs.model_idx], w,
                    axis_name=axis_name)
                at_floor = (thres_sched[i]
                            <= 2.001 * jnp.asarray(dist_thres, jnp.float32) / 16.0)
                t_new = jnp.where(at_floor, t_gn, t_kab)
        else:
            t_new = weighted_kabsch(scene.xyz, model.cloud.xyz[corrs.model_idx], w,
                                    axis_name=axis_name)
        return jnp.where(corrs.count >= 3, t_new, t)

    return lax.fori_loop(0, iterations, tight_body, t0)
