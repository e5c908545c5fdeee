"""Synthetic cloud generators for tests and benchmarks.

The reference ships no data or tests; acceptance configs (BASELINE.json)
call for synthetic plane/cylinder/CAD scenes with known ground-truth poses.
These generators produce clouds in the reference's point convention:
positions + normals + edge tangents (tangent ~ unit on feature edges, zero
on smooth surface — see tangent accessor /root/reference/include/common:62-70
and the edge filter /root/reference/include/impl/model.hpp:96-99).
"""

from __future__ import annotations

import numpy as np

from triplet_match_tpu.core.cloud import PointCloud


def _rng(seed):
    return np.random.default_rng(seed)


def rotation_matrix(axis, angle: float) -> np.ndarray:
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
    return r.astype(np.float32)


def make_box_model(
    n_edge: int = 400,
    n_face: int = 800,
    size=(1.0, 0.7, 0.4),
    seed: int = 0,
    jitter: float = 0.0,
):
    """Box "CAD model": edge points on the 12 edges + surface points on faces.

    Returns (xyz, normal, tangent) float32 arrays.  Edge points carry unit
    tangents along the edge and normals set to the mean of the two adjacent
    face normals; face points have zero tangents.
    """
    rng = _rng(seed)
    sx, sy, sz = [s / 2.0 for s in size]
    h = np.array([sx, sy, sz], np.float32)

    # 12 edges: (fixed_axes, varying axis)
    edges = []
    for vary in range(3):
        fixed = [a for a in range(3) if a != vary]
        for s0 in (-1, 1):
            for s1 in (-1, 1):
                edges.append((vary, fixed, (s0, s1)))

    per_edge = max(n_edge // 12, 2)
    pts, tans, nrms = [], [], []
    for vary, fixed, (s0, s1) in edges:
        t = rng.uniform(-1, 1, per_edge)
        p = np.zeros((per_edge, 3), np.float32)
        p[:, vary] = t * h[vary]
        p[:, fixed[0]] = s0 * h[fixed[0]]
        p[:, fixed[1]] = s1 * h[fixed[1]]
        tg = np.zeros((per_edge, 3), np.float32)
        tg[:, vary] = 1.0
        nm = np.zeros((per_edge, 3), np.float32)
        nm[:, fixed[0]] = s0
        nm[:, fixed[1]] = s1
        nm /= np.linalg.norm(nm, axis=1, keepdims=True)
        pts.append(p)
        tans.append(tg)
        nrms.append(nm)

    # faces: 6 faces, surface points, zero tangent
    per_face = max(n_face // 6, 2)
    for axis in range(3):
        others = [a for a in range(3) if a != axis]
        for sgn in (-1, 1):
            uv = rng.uniform(-1, 1, (per_face, 2))
            p = np.zeros((per_face, 3), np.float32)
            p[:, axis] = sgn * h[axis]
            p[:, others[0]] = uv[:, 0] * h[others[0]]
            p[:, others[1]] = uv[:, 1] * h[others[1]]
            nm = np.zeros((per_face, 3), np.float32)
            nm[:, axis] = sgn
            pts.append(p)
            tans.append(np.zeros((per_face, 3), np.float32))
            nrms.append(nm)

    xyz = np.concatenate(pts)
    tangent = np.concatenate(tans)
    normal = np.concatenate(nrms)
    if jitter > 0:
        xyz = xyz + rng.normal(0, jitter, xyz.shape).astype(np.float32)
    return xyz.astype(np.float32), normal.astype(np.float32), tangent.astype(np.float32)


def make_plane_patch(n: int = 2000, size=(2.0, 2.0), seed: int = 1, border_edges: bool = True):
    """Planar patch in z=0 with optional edge-tangent border points."""
    rng = _rng(seed)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = rng.uniform(-size[0] / 2, size[0] / 2, n)
    xyz[:, 1] = rng.uniform(-size[1] / 2, size[1] / 2, n)
    normal = np.tile(np.array([0, 0, 1], np.float32), (n, 1))
    tangent = np.zeros((n, 3), np.float32)
    if border_edges:
        nb = n // 5
        for i, (axis, sgn) in enumerate([(0, -1), (0, 1), (1, -1), (1, 1)]):
            sl = slice(i * nb // 4, (i + 1) * nb // 4)
            xyz[sl, axis] = sgn * size[axis] / 2
            tangent[sl, 1 - axis] = 1.0
    return xyz, normal, tangent


def fog_patches(rng, n_clutter: int, seed_base: int, n_per: int = 2000,
                size=(1.5, 1.5), extent: float = 5.0):
    """Touching surface clutter: scattered plane patches with NO clearance.

    Real scans are surfaces, not volumetric fog; patches are placed
    uniformly in a +-extent cube and may touch, cross, or overlap whatever
    instances the caller embeds — scoring must discriminate against contact
    clutter.  The shared builder for every full-scale evidence protocol
    (recall studies, acceptance configs) so their scenes cannot drift.

    Returns (xyz [n_clutter, 3], normals [n_clutter, 3]) — tangent-free.
    """
    patches = []
    for i in range(max(-(-n_clutter // n_per), 1)):
        pxyz, pn, _ = make_plane_patch(n=n_per, size=size, seed=seed_base + i,
                                       border_edges=False)
        rr = rotation_matrix(rng.normal(size=3), rng.uniform(0, np.pi))
        tt = rng.uniform(-extent, extent, 3).astype(np.float32)
        patches.append(((pxyz @ rr.T + tt).astype(np.float32),
                        (pn @ rr.T).astype(np.float32)))
    cx = np.concatenate([p[0] for p in patches])[:n_clutter]
    cn = np.concatenate([p[1] for p in patches])[:n_clutter]
    return cx, cn


def make_cylinder(n: int = 3000, radius: float = 0.5, height: float = 2.0, seed: int = 2,
                  rim_edges: bool = True):
    """Cylinder barrel with optional rim edge points (tangent along the rim)."""
    rng = _rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-height / 2, height / 2, n)
    xyz = np.stack([radius * np.cos(theta), radius * np.sin(theta), z], 1).astype(np.float32)
    normal = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], 1).astype(np.float32)
    tangent = np.zeros((n, 3), np.float32)
    if rim_edges:
        nb = n // 5
        for i, sgn in enumerate([-1, 1]):
            sl = slice(i * nb // 2, (i + 1) * nb // 2)
            xyz[sl, 2] = sgn * height / 2
            tangent[sl, 0] = -np.sin(theta[sl])
            tangent[sl, 1] = np.cos(theta[sl])
    return xyz, normal, tangent


def embed_in_scene(
    model_xyz,
    model_normal,
    model_tangent,
    *,
    rotation=None,
    translation=None,
    noise: float = 0.0,
    n_clutter: int = 0,
    clutter_extent: float = 4.0,
    seed: int = 7,
    capacity: int | None = None,
):
    """Place a transformed copy of the model into a cluttered scene.

    Returns (scene: PointCloud, t_model_to_scene [4,4] float32, instance_mask).
    Clutter points are smooth-surface points with random normals.
    """
    rng = _rng(seed)
    r = rotation if rotation is not None else rotation_matrix(rng.normal(size=3), rng.uniform(0, np.pi))
    t = translation if translation is not None else rng.uniform(-1, 1, 3).astype(np.float32)
    r = np.asarray(r, np.float32)
    t = np.asarray(t, np.float32)

    xyz = model_xyz @ r.T + t
    if noise > 0:
        xyz = xyz + rng.normal(0, noise, xyz.shape).astype(np.float32)
    normal = model_normal @ r.T
    tangent = model_tangent @ r.T

    if n_clutter > 0:
        cx = rng.uniform(-clutter_extent / 2, clutter_extent / 2, (n_clutter, 3)).astype(np.float32)
        cn = rng.normal(size=(n_clutter, 3)).astype(np.float32)
        cn /= np.linalg.norm(cn, axis=1, keepdims=True)
        ct = np.zeros((n_clutter, 3), np.float32)
        xyz = np.concatenate([xyz, cx])
        normal = np.concatenate([normal, cn])
        tangent = np.concatenate([tangent, ct])

    inst = np.zeros(xyz.shape[0], bool)
    inst[: model_xyz.shape[0]] = True

    tm = np.eye(4, dtype=np.float32)
    tm[:3, :3] = r
    tm[:3, 3] = t
    scene = PointCloud.from_arrays(xyz, normal, tangent, capacity=capacity)
    return scene, tm, inst


def make_lattice_model(cells: int = 4, n_edge: int = 20000, size: float = 1.0,
                       seed: int = 0, jitter: float = 0.0, graded: bool = False):
    """Wireframe lattice "scaffold" model: EVERY point is an edge point.

    A (cells x cells x cells) grid of struts — the degenerate case for the
    pair-table subsampling cap (index/model.compile_model max_pair_points):
    the reference enumerates ALL edge pairs (impl/model.hpp:124-149), and a
    scaffold scan is exactly the geometry where the edge count explodes.
    Points sit on the axis-aligned grid beams with tangents along the beam;
    normals point radially away from the beam axis (arbitrary but smooth).

    Returns (xyz, normal, tangent) float32 arrays with ~n_edge points.
    """
    rng = _rng(seed)
    if graded:
        # geometrically graded plane spacing: breaks the cubic + cell-shift
        # self-symmetries so pose recall can compare against ground truth
        # directly (a uniform lattice maps onto itself under dozens of
        # rigid self-maps)
        u = np.geomspace(1.0, 2.0, cells + 1)
        lin = (size * (u - u[0]) / (u[-1] - u[0]) - size / 2).astype(np.float32)
    else:
        lin = np.linspace(-size / 2, size / 2, cells + 1).astype(np.float32)

    beams = []  # (vary axis, fixed coords)
    for vary in range(3):
        fixed = [a for a in range(3) if a != vary]
        for fa in lin:
            for fb in lin:
                beams.append((vary, fixed, fa, fb))
    per_beam = max(n_edge // len(beams), 2)

    pts, tans, nrms = [], [], []
    for vary, fixed, fa, fb in beams:
        t = rng.uniform(-size / 2, size / 2, per_beam).astype(np.float32)
        p = np.zeros((per_beam, 3), np.float32)
        p[:, vary] = t
        p[:, fixed[0]] = fa
        p[:, fixed[1]] = fb
        tg = np.zeros((per_beam, 3), np.float32)
        tg[:, vary] = 1.0
        # radial normal: a smooth unit field perpendicular to the beam
        theta = rng.uniform(0, 2 * np.pi, per_beam).astype(np.float32)
        nm = np.zeros((per_beam, 3), np.float32)
        nm[:, fixed[0]] = np.cos(theta)
        nm[:, fixed[1]] = np.sin(theta)
        pts.append(p)
        tans.append(tg)
        nrms.append(nm)

    xyz = np.concatenate(pts)
    tangent = np.concatenate(tans)
    normal = np.concatenate(nrms)
    if jitter > 0:
        xyz = xyz + rng.normal(0, jitter, xyz.shape).astype(np.float32)
    return xyz.astype(np.float32), normal.astype(np.float32), tangent.astype(np.float32)
