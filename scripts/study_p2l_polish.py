"""CPU A/B study: point-to-line edge anchor vs point-to-point (round 5).

The edge-anchored tight polish (policy.tight_edges_only) fits on
tangent-bearing correspondences with a point-to-point Kabsch step.  Edge
points are SAMPLED along the model's edge curves (600 pts over a 9.6 m
total edge length at the box fixture = 16 mm spacing), so nearest-point
correspondences carry an along-edge offset that is pure sampling phase —
the hardware recall rows measure the resulting pose floor at ~0.15 mm
(RESULTS_r5.jsonl r5_hw_recall500k note).  The hybrid Gauss-Newton step
(core/transforms.gauss_newton_pose_step, policy.icp_point_to_plane)
projects edge residuals perpendicular to the tangent (M = I - t t^T),
so the along-edge sampling phase cannot enter the normal equations at
all; surface corrs constrain along normals (point-to-plane).

This study drives tight_polish directly on the CPU-scale fog fixtures
(the same geometry as tests/test_icp_clutter.py) over several instance
seeds and reports final pose error for:
  - edges_only + point-to-point Kabsch (shipped round-5 default)
  - edges_only + hybrid GN (candidate: point-to-line anchor)
plus a clean-scene control (no fog) for both.

Reference anchor: the upstream ICP is point-to-point umeyama
(/root/reference/include/impl/scene.hpp:393); everything here is a
deliberate improvement layered behind acceptance-neutral polish.
"""

from __future__ import annotations

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from triplet_match_tpu.config import (  # noqa: E402
    DiscretizationParams,
    SampleParams,
    SearchPolicy,
)
from triplet_match_tpu.core.cloud import PointCloud  # noqa: E402
from triplet_match_tpu.core.transforms import invert_rigid, pose_delta  # noqa: E402
from triplet_match_tpu.index.model import compile_model  # noqa: E402
from triplet_match_tpu.io.synthetic import (  # noqa: E402
    fog_patches,
    make_box_model,
    rotation_matrix,
)
from triplet_match_tpu.refine.icp import icp_refine, tight_polish  # noqa: E402
from triplet_match_tpu.search.driver import prepare_scene  # noqa: E402

DISC = DiscretizationParams()
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
POLICY = SearchPolicy()


def build_scene(seed: int, fog: int, shell: bool, resample: bool = True):
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800,
                                   size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan),
                          DISC, SAMPLE, POLICY)
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    r_inst = rotation_matrix(axis / np.linalg.norm(axis),
                             float(rng.uniform(0.3, 1.4)))
    if resample:
        # the scene observes the SURFACE, not the model's own sample set:
        # an independently-phased sampling is what the hardware recall
        # scenes see after scene prep, and is where the along-edge
        # point-to-point quantization floor comes from
        xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800,
                                       size=(1.0, 0.8, 0.6), seed=100 + seed)
    i_xyz = (xyz @ r_inst.T + rng.normal(0, 0.001, xyz.shape)).astype(np.float32)
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = r_inst

    parts_xyz = [i_xyz]
    parts_nrm = [nrm @ r_inst.T]
    parts_tan = [tan @ r_inst.T]
    if fog:
        c_xyz, c_nrm = fog_patches(rng, fog, seed_base=9000 + seed, extent=0.9)
        parts_xyz.append(c_xyz)
        parts_nrm.append(c_nrm)
        parts_tan.append(np.zeros_like(c_xyz))
    if shell:
        face_z = np.flatnonzero(nrm[:, 2] > 0.7)
        s_idx = rng.choice(face_z, 12000)
        s_xyz = (((xyz[s_idx] + nrm[s_idx] * 0.003) @ r_inst.T)
                 + rng.normal(0, 0.001, (12000, 3))).astype(np.float32)
        parts_xyz.append(s_xyz)
        parts_nrm.append((nrm[s_idx] @ r_inst.T).astype(np.float32))
        parts_tan.append(np.zeros_like(s_xyz))

    scene = PointCloud.from_arrays(
        np.concatenate(parts_xyz).astype(np.float32),
        np.concatenate(parts_nrm).astype(np.float32),
        np.concatenate(parts_tan).astype(np.float32),
    )
    prep = prepare_scene(scene, POLICY)
    consumed = jnp.zeros(scene.xyz.shape[0], bool)
    pert = np.eye(4, dtype=np.float32)
    pax = rng.normal(size=3)
    pert[:3, :3] = rotation_matrix(pax / np.linalg.norm(pax), np.deg2rad(1.5))
    pert[:3, 3] = rng.uniform(-0.01, 0.01, 3)
    t0 = jnp.asarray(invert_rigid(jnp.asarray(pert @ t_gt)))
    return model, prep, consumed, t0, t_gt


def delta_mm(t_scene_to_model, t_gt):
    dt, dr = pose_delta(np.asarray(invert_rigid(t_scene_to_model)), t_gt)
    return float(dt) * 1000.0, float(dr)


def run_case(name: str, seed: int, fog: int, shell: bool):
    model, prep, consumed, t0, t_gt = build_scene(seed, fog, shell)
    relaxed = icp_refine(model, prep.cloud, prep.tangent_mask, consumed, t0,
                         3.0, 15, tight_iterations=0)
    out = {"case": name, "seed": seed, "fog": fog, "shell": shell}
    for label, p2l in (("p2p", False), ("p2l", True)):
        t_pol = tight_polish(
            model, prep.cloud, prep.tangent_mask, consumed, relaxed.transform,
            3.0, iterations=POLICY.tight_icp_iterations,
            orientation_weight=POLICY.tight_orientation_weight,
            anneal=POLICY.tight_anneal, edges_only=True,
            point_to_plane=p2l)
        dt, dr = delta_mm(t_pol, t_gt)
        out[f"{label}_mm"] = round(dt, 4)
        out[f"{label}_deg"] = round(dr, 4)
    print(json.dumps(out), flush=True)
    return out


def main():
    seeds = [11, 21, 33, 47, 58]
    rows = []
    for s in seeds:
        rows.append(run_case("fogbound", s, fog=60000, shell=True))
    for s in seeds[:3]:
        rows.append(run_case("dense_fog", s, fog=40000, shell=False))
    for s in seeds[:3]:
        rows.append(run_case("clean", s, fog=0, shell=False))
    summary = {}
    for case in ("fogbound", "dense_fog", "clean"):
        sel = [r for r in rows if r["case"] == case]
        summary[case] = {
            "p2p_max_mm": max(r["p2p_mm"] for r in sel),
            "p2l_max_mm": max(r["p2l_mm"] for r in sel),
            "p2p_mean_mm": round(sum(r["p2p_mm"] for r in sel) / len(sel), 4),
            "p2l_mean_mm": round(sum(r["p2l_mm"] for r in sel) / len(sel), 4),
        }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
