"""Model self-symmetry detection + symmetry-aware match comparison.

Symmetric models (boxes, cylinders, gears) produce matches anywhere on the
symmetry orbit: pair features cannot distinguish a pose from pose @ S when
S maps the model onto itself (true for the reference as well — its matcher
returns an arbitrary orbit member).  This module makes the ambiguity
explicit: ``detect_self_symmetries`` registers the model against its own
cloud through the regular hypothesis machinery and returns the orbit of
rigid self-maps; ``symmetry_equivalent`` compares two poses modulo that
orbit (the right notion of "same match" for reporting and deduplication).

No reference analog (the reference has no symmetry handling; ROADMAP
item 7).
"""

from __future__ import annotations

import dataclasses

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
from triplet_match_tpu.index.model import CompiledModel


def _rot_angle_deg(r: np.ndarray) -> float:
    c = np.clip((np.trace(r) - 1.0) * 0.5, -1.0, 1.0)
    return float(np.degrees(np.arccos(c)))


def detect_self_symmetries(
    model: CompiledModel,
    discretization: DiscretizationParams = DEFAULT_DISCRETIZATION,
    sample_params: SampleParams = DEFAULT_SAMPLE_PARAMS,
    policy: SearchPolicy = DEFAULT_POLICY,
    *,
    seed: int = 0,
    rounds: int = 2,
    min_overlap: float = 0.8,
    angle_tol_deg: float = 8.0,
    trans_tol_factor: float = 2.0,
    max_orbit: int = 16,
    refine_budget: int = 48,
) -> np.ndarray:
    """Rigid self-maps of the model: [K, 4, 4] with S @ model ~= model.

    Runs the standard sample -> query -> base_transform -> score machinery
    with the model cloud as its own scene, ICP-converges candidate poses
    onto their exact self-map, verifies each with a full finish_find, and
    dedups by rotation/translation distance.  Coverage is measured RELATIVE
    to the identity's own self-coverage (finite sampling and tangent-kind
    boundary effects keep even exact symmetries below 100% absolute
    coverage), accepting poses with count >= min_overlap * count(I).  The
    identity is always included and always first.
    """
    from triplet_match_tpu.refine.icp import icp_refine
    from triplet_match_tpu.search.driver import (
        ScenePrep,
        hypothesize_and_score,
    )
    from triplet_match_tpu.search.score import finish_find

    # the model cloud as a scene: edge mask is the compiled edge subset
    prep = ScenePrep(cloud=model.cloud, tangent_mask=model.edge, n_edge=model.n_edge)
    n = model.cloud.xyz.shape[0]
    consumed = jnp.zeros(n, bool)
    fp = jnp.zeros(n, bool)

    # force the jnp scorer: symmetry detection is offline/once-per-model
    pol = dataclasses.replace(policy, scorer="jnp", two_phase_scoring=False)

    from functools import partial

    hyp_fn = jax.jit(partial(
        hypothesize_and_score,
        discretization=discretization, sample_params=sample_params, policy=pol,
    ))
    ff = jax.jit(lambda t: finish_find(
        model, model.cloud, model.edge, consumed, t, pol.corr_dist_factor
    ))
    # ICP against the model's own cloud: candidate self-maps converge onto
    # the exact orbit element (and near-identity jitter converges to I, so
    # the orbit dedup below is sharp).  Two chained passes with extra tight
    # iterations: a single pass can stall a few degrees off on models with
    # near-symmetric faces.
    _icp1 = jax.jit(lambda t: icp_refine(
        model, model.cloud, model.edge, consumed, t, pol.corr_dist_factor, 10,
        tight_iterations=4,
    ).transform)

    def refine(t):
        return _icp1(_icp1(t))

    base_key = jax.random.PRNGKey(seed)
    orbit = [np.eye(4, dtype=np.float32)]
    trans_tol = trans_tol_factor * float(model.resolution)

    def in_orbit(t):
        for s in orbit:
            d_r = _rot_angle_deg(t[:3, :3] @ s[:3, :3].T)
            d_t = float(np.linalg.norm(t[:3, 3] - s[:3, 3]))
            if d_r < angle_tol_deg and d_t < trans_tol:
                return True
        return False

    cov_id = max(int(ff(jnp.eye(4)).count), 1)  # identity self-coverage
    for rnd in range(rounds):
        key = jax.random.fold_in(base_key, rnd)
        ts_flat, scores, _, _, _ = hyp_fn(model, prep, consumed, fp, key,
                                          jnp.float32(pol.corr_dist_factor), None)
        order = np.argsort(-np.asarray(scores))
        cand = np.asarray(ts_flat)[order]
        budget = refine_budget
        for t in cand:
            if len(orbit) >= max_orbit or budget == 0:
                break
            if in_orbit(t):
                continue
            budget -= 1
            t_ref = np.asarray(refine(jnp.asarray(t)), np.float32)
            if in_orbit(t_ref):
                continue
            cov = int(ff(jnp.asarray(t_ref)).count) / cov_id
            if cov >= min_overlap:
                orbit.append(t_ref)
    return np.stack(orbit)


def symmetry_equivalent(t1, t2, orbit: np.ndarray, *, angle_tol_deg: float = 5.0,
                        trans_tol: float = 1e-2) -> bool:
    """True when two model->scene poses place the model identically modulo
    the symmetry orbit: t2 ~= t1 @ S for some S in the orbit."""
    t1 = np.asarray(t1)
    t2 = np.asarray(t2)
    rel = np.linalg.inv(t1) @ t2  # model-space self-map
    for s in np.asarray(orbit):
        d_r = _rot_angle_deg(rel[:3, :3] @ s[:3, :3].T)
        d_t = float(np.linalg.norm(rel[:3, 3] - s[:3, 3]))
        if d_r < angle_tol_deg and d_t < trans_tol:
            return True
    return False
