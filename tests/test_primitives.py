"""Tests for projector primitives: round-trips, fits, detection."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.io.synthetic import make_cylinder, make_plane_patch, rotation_matrix
from triplet_match_tpu.primitives import cylinder as cyl
from triplet_match_tpu.primitives import identity as ident
from triplet_match_tpu.primitives import plane as pln
from triplet_match_tpu.primitives.base import unit_orthogonal
from triplet_match_tpu.primitives.detect import detect_cylinder, detect_plane


def _posed_plane(seed=0, noise=0.0):
    xyz, nrm, tan = make_plane_patch(n=1500, seed=seed)
    r = rotation_matrix([1, 2, 0.5], 1.1)
    t = np.array([0.5, -1.0, 2.0], np.float32)
    rng = np.random.default_rng(seed)
    x = xyz @ r.T + t
    if noise:
        x = x + rng.normal(0, noise, x.shape).astype(np.float32)
    return PointCloud.from_arrays(x, nrm @ r.T, tan @ r.T), r, t


def _posed_cylinder(seed=0, radius=0.5, noise=0.0):
    xyz, nrm, tan = make_cylinder(n=2000, radius=radius, seed=seed, rim_edges=False)
    r = rotation_matrix([0.2, 1, 0.1], 0.8)
    t = np.array([1.0, 0.5, -0.3], np.float32)
    rng = np.random.default_rng(seed)
    x = xyz @ r.T + t
    if noise:
        x = x + rng.normal(0, noise, x.shape).astype(np.float32)
    return PointCloud.from_arrays(x, nrm @ r.T, tan @ r.T), r, t


def test_unit_orthogonal():
    rng = np.random.default_rng(0)
    vs = rng.normal(size=(50, 3)).astype(np.float32)
    vs = np.concatenate([vs, [[0, 0, 1], [0, 0, -2], [1e-8, 1e-8, 3]]]).astype(np.float32)
    u = np.asarray(unit_orthogonal(jnp.asarray(vs)))
    dots = np.abs((u * vs).sum(1)) / np.linalg.norm(vs, axis=1)
    assert dots.max() < 1e-5
    np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1.0, atol=1e-5)


def test_plane_fit_and_roundtrip():
    cloud, r, t = _posed_plane()
    state = pln.fit_from_cloud(cloud)
    uvw, valid = pln.project(state, cloud.xyz)
    assert bool(valid.all())
    # plane normal: w coords of on-plane points ~ 0
    assert float(jnp.abs(uvw[..., 2]).max()) < 1e-3
    back = pln.unproject(state, uvw)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cloud.xyz), atol=1e-4)


def test_plane_height_rejection():
    cloud, r, t = _posed_plane(noise=0.001)
    state = pln.fit_from_cloud(cloud)
    off = cloud.xyz + jnp.asarray(r[:, 2] * 1.0)  # 1m off-plane
    _, valid = pln.project(state, off)
    assert not bool(valid.any())


def test_plane2_sample_hypothesis_consistency():
    cloud, r, t = _posed_plane()
    state = pln.fit_from_cloud(cloud)
    p = cloud.xyz[:3]
    good, ok = pln.fit_from_samples3(state, p[0], p[1], p[2],
                                     cloud.normal[0], cloud.normal[1], cloud.normal[2])
    assert bool(ok)
    # inconsistent normals rejected
    bad_n = jnp.asarray(np.array([1.0, 0, 0], np.float32))
    _, ok2 = pln.fit_from_samples3(state, p[0], p[1], p[2], bad_n, cloud.normal[1], cloud.normal[2])
    # normal must disagree with the plane normal by construction
    if abs(float(jnp.dot(bad_n, jnp.asarray(r[:, 2])))) < 0.9:
        assert not bool(ok2)


def test_cylinder_two_point_fit_exact():
    cloud, r, t = _posed_cylinder(radius=0.5)
    gt_axis = r[:, 2]
    ref = cyl.CylinderState(jnp.eye(4), jnp.eye(4), jnp.zeros(3), jnp.float32(1.0), jnp.float32(0.1))
    state, ok = cyl.fit_from_samples(ref, cloud.xyz[0], cloud.xyz[700],
                                     cloud.normal[0], cloud.normal[700])
    assert bool(ok)
    assert abs(float(state.radius) - 0.5) < 1e-2
    axis = np.asarray(state.g2l)[2, :3]
    assert abs(abs(axis @ gt_axis) - 1.0) < 1e-3


def test_cylinder_project_unproject_roundtrip():
    cloud, r, t = _posed_cylinder(radius=0.5)
    state = cyl.fit_from_cloud(cloud, key=jax.random.PRNGKey(1), num_hypotheses=128)
    assert abs(float(state.radius) - 0.5) < 0.02
    uvw, valid = cyl.project(state, cloud.xyz)
    assert float(valid.mean()) > 0.99
    back = cyl.unproject(state, uvw)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cloud.xyz), atol=1e-3)
    # w ~ 0 on the surface
    assert float(jnp.abs(uvw[..., 2]).max()) < 0.05


def test_cylinder_intrinsic_distance_wraps():
    state = cyl.CylinderState(jnp.eye(4), jnp.eye(4), jnp.zeros(3), jnp.float32(1.0), jnp.float32(0.1))
    two_pi = float(2 * np.pi)
    a = jnp.asarray([0.1, 0.0, 0.0])
    b = jnp.asarray([two_pi - 0.1, 0.0, 0.0])  # just around the seam
    d = float(cyl.intrinsic_distance(state, a, b))
    assert abs(d - 0.2) < 1e-5


def test_cylinder_tangent_pushforward():
    # an axis-aligned cylinder: a world vector along +z maps to chart v-axis
    state = cyl.CylinderState(jnp.eye(4), jnp.eye(4), jnp.zeros(3), jnp.float32(1.0), jnp.float32(0.1))
    p = jnp.asarray([1.0, 0.0, 0.0])
    tz = cyl.tangent(state, p, jnp.asarray([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(tz), [0, 1, 0], atol=1e-6)
    # circumferential vector maps to u-axis
    tc = cyl.tangent(state, p, jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(tc), [1, 0, 0], atol=1e-6)


def test_identity_passthrough():
    s = ident.fit_from_cloud(None)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32))
    uvw, valid = ident.project(s, x)
    np.testing.assert_array_equal(np.asarray(uvw), np.asarray(x))
    assert bool(valid.all())
    np.testing.assert_array_equal(np.asarray(ident.unproject(s, uvw)), np.asarray(x))


def test_detect_plane_in_clutter():
    cloud, r, t = _posed_plane(noise=0.002)
    rng = np.random.default_rng(5)
    clutter = rng.uniform(-3, 3, (700, 3)).astype(np.float32)
    xyz = np.concatenate([np.asarray(cloud.xyz), clutter])
    nrm = np.concatenate([np.asarray(cloud.normal), rng.normal(size=(700, 3)).astype(np.float32)])
    mixed = PointCloud.from_arrays(xyz, nrm)
    det = detect_plane(mixed, key=jax.random.PRNGKey(2), num_hypotheses=128, threshold=0.01)
    inl = np.asarray(det.inliers)
    n_plane = cloud.xyz.shape[0]
    assert inl[:n_plane].mean() > 0.95  # recovers the plane
    assert inl[n_plane:].mean() < 0.02  # rejects clutter


def test_detect_cylinder_in_clutter():
    cloud, r, t = _posed_cylinder(radius=0.5, noise=0.002)
    rng = np.random.default_rng(6)
    clutter = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    cn = rng.normal(size=(500, 3)).astype(np.float32)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    xyz = np.concatenate([np.asarray(cloud.xyz), clutter])
    nrm = np.concatenate([np.asarray(cloud.normal), cn])
    mixed = PointCloud.from_arrays(xyz, nrm)
    det = detect_cylinder(mixed, key=jax.random.PRNGKey(3), num_hypotheses=256, threshold=0.01)
    inl = np.asarray(det.inliers)
    n_cyl = cloud.xyz.shape[0]
    assert abs(float(det.state.radius) - 0.5) < 0.05
    assert inl[:n_cyl].mean() > 0.9
    assert inl[n_cyl:].mean() < 0.05


def test_cylinder_pushforward_matches_autodiff():
    """The hand-derived chart Jacobian pushforward (impl/cylinder_traits.hpp:132-154)
    must agree with jax.jacfwd of the projection."""

    def proj_u(state, xyz):
        loc = np.asarray(state.g2l)[:3, :3] @ xyz + np.asarray(state.g2l)[:3, 3]
        return loc

    state = cyl.CylinderState(jnp.eye(4), jnp.eye(4), jnp.zeros(3), jnp.float32(0.7), jnp.float32(0.5))

    def chart(p):
        uvw, _ = cyl.project(state, p)
        return uvw

    rng = np.random.default_rng(3)
    for _ in range(5):
        theta = rng.uniform(0.3, 5.0)  # stay off the atan2 seam
        p = jnp.asarray([0.7 * np.cos(theta), 0.7 * np.sin(theta), rng.uniform(-1, 1)],
                        jnp.float32)
        v = rng.normal(size=3).astype(np.float32)
        # tangent vector must be tangent to the cylinder (perp to radial dir)
        radial = np.array([np.cos(theta), np.sin(theta), 0], np.float32)
        v = v - (v @ radial) * radial
        v /= np.linalg.norm(v)
        jac = jax.jacfwd(chart)(p)  # [3, 3]
        want = np.asarray(jac) @ v
        want /= np.linalg.norm(want)
        got = np.asarray(cyl.tangent(state, p, jnp.asarray(v)))
        np.testing.assert_allclose(np.abs(got @ want), 1.0, atol=1e-4)


def test_sphere_fit_project_roundtrip():
    """Sphere trait: 2-point closed-form fit is exact on noiseless samples;
    MSAC detection recovers center/radius under clutter; chart
    project/unproject roundtrips; great-circle intrinsic distance."""
    import numpy as np
    import jax.numpy as jnp

    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.primitives import sphere as sph
    from triplet_match_tpu.primitives.detect import detect_sphere

    rng = np.random.default_rng(0)
    center = np.array([0.5, -0.3, 1.2], np.float32)
    radius = 0.75

    # noiseless minimal fit
    d = rng.normal(size=(2, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p = center + radius * d
    st, ok = sph.fit_from_samples(None, jnp.asarray(p[0]), jnp.asarray(p[1]),
                                  jnp.asarray(d[0]), jnp.asarray(d[1]))
    assert bool(ok)
    assert np.allclose(np.asarray(st.center), center, atol=1e-5)
    assert abs(float(st.radius) - radius) < 1e-5

    # detection under clutter
    dirs = rng.normal(size=(800, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    on = center + radius * dirs + rng.normal(0, 5e-4, (800, 3)).astype(np.float32)
    clutter = rng.uniform(-3, 3, (400, 3)).astype(np.float32)
    cn = rng.normal(size=(400, 3)).astype(np.float32)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    cloud = PointCloud.from_arrays(np.concatenate([on, clutter]),
                                   np.concatenate([dirs, cn]),
                                   np.zeros((1200, 3), np.float32))
    det = detect_sphere(cloud, num_hypotheses=256)
    assert np.allclose(np.asarray(det.state.center), center, atol=5e-3)
    assert abs(float(det.state.radius) - radius) < 5e-3
    inl = np.asarray(det.inliers)
    assert inl[:800].mean() > 0.95  # sphere points in
    assert inl[800:].mean() < 0.1   # clutter out

    # chart roundtrip away from the poles
    q = np.asarray(det.state.center) + radius * dirs[np.abs(dirs[:, 2]) < 0.9]
    uvw, valid = sph.project(det.state, jnp.asarray(q))
    assert bool(jnp.all(valid))
    back = sph.unproject(det.state, uvw)
    assert float(jnp.max(jnp.linalg.norm(back - q, axis=-1))) < 5e-3

    # intrinsic distance: two equator points a quarter-turn apart
    qa = center + radius * np.array([1.0, 0.0, 0.0], np.float32)
    qb = center + radius * np.array([0.0, 1.0, 0.0], np.float32)
    st2 = sph._state_from_center(jnp.asarray(center), jnp.float32(radius), jnp.float32(0.01))
    ua, _ = sph.project(st2, jnp.asarray(qa))
    ub, _ = sph.project(st2, jnp.asarray(qb))
    dd = float(sph.intrinsic_distance(st2, ua, ub))
    assert abs(dd - radius * np.pi / 2) < 1e-4
