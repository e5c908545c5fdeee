"""Tests for pair-frame alignment and weighted Kabsch."""

import numpy as np
import jax.numpy as jnp

from triplet_match_tpu.core.transforms import (
    base_transform,
    invert_rigid,
    pose_delta,
    rotation_angle,
    transform_points,
    weighted_kabsch,
)
from triplet_match_tpu.io.synthetic import rotation_matrix


def random_pose(seed):
    rng = np.random.default_rng(seed)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = rotation_matrix(rng.normal(size=3), rng.uniform(0.1, 3.0))
    t[:3, 3] = rng.uniform(-2, 2, 3)
    return t


def test_base_transform_recovers_pose():
    """If (tgt_i, tgt_j, tgt_t) = T(src_i, src_j, src_t), base_transform == T."""
    rng = np.random.default_rng(0)
    for seed in range(5):
        t = random_pose(seed)
        src_i = rng.normal(size=3).astype(np.float32)
        src_j = rng.normal(size=3).astype(np.float32)
        tangent = rng.normal(size=3).astype(np.float32)
        tangent /= np.linalg.norm(tangent)
        r = t[:3, :3]
        got = np.asarray(
            base_transform(
                jnp.asarray(src_i), jnp.asarray(src_j), jnp.asarray(tangent),
                jnp.asarray(r @ src_i + t[:3, 3]), jnp.asarray(r @ src_j + t[:3, 3]),
                jnp.asarray(r @ tangent),
            )
        )
        np.testing.assert_allclose(got, t, atol=2e-5)


def test_base_transform_batched():
    t = random_pose(7)
    src_i = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)
    src_j = src_i + np.array([1, 0, 0], np.float32)
    tan = np.tile(np.array([0, 1, 0], np.float32), (4, 1))
    r = t[:3, :3]
    got = np.asarray(
        base_transform(
            jnp.asarray(src_i), jnp.asarray(src_j), jnp.asarray(tan),
            jnp.asarray(src_i @ r.T + t[:3, 3]), jnp.asarray(src_j @ r.T + t[:3, 3]),
            jnp.asarray(tan @ r.T),
        )
    )
    assert got.shape == (4, 4, 4)
    for g in got:
        np.testing.assert_allclose(g, t, atol=2e-5)


def test_weighted_kabsch_exact_recovery():
    rng = np.random.default_rng(2)
    t = random_pose(3)
    src = rng.normal(size=(50, 3)).astype(np.float32)
    dst = src @ t[:3, :3].T + t[:3, 3]
    w = np.ones(50, np.float32)
    got = np.asarray(weighted_kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(got, t, atol=1e-5)


def test_weighted_kabsch_ignores_masked_outliers():
    rng = np.random.default_rng(4)
    t = random_pose(5)
    src = rng.normal(size=(60, 3)).astype(np.float32)
    dst = src @ t[:3, :3].T + t[:3, 3]
    dst[40:] = rng.normal(size=(20, 3)) * 50  # wild outliers
    w = np.ones(60, np.float32)
    w[40:] = 0.0
    got = np.asarray(weighted_kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(got, t, atol=1e-4)


def test_weighted_kabsch_degenerate_returns_identity():
    src = jnp.zeros((10, 3))
    dst = jnp.ones((10, 3))
    w = jnp.zeros(10)
    got = np.asarray(weighted_kabsch(src, dst, w))
    np.testing.assert_allclose(got, np.eye(4), atol=1e-6)


def test_invert_and_delta():
    t = random_pose(6)
    ti = np.asarray(invert_rigid(jnp.asarray(t)))
    np.testing.assert_allclose(ti @ t, np.eye(4), atol=1e-5)
    dt, dr = pose_delta(jnp.asarray(t), jnp.asarray(t))
    assert float(dt) < 1e-5 and float(dr) < 1e-3


def test_rotation_angle():
    r = rotation_matrix([0, 0, 1], 0.5)
    assert abs(float(rotation_angle(jnp.asarray(r))) - 0.5) < 1e-5


def test_transform_points_matches_manual():
    t = random_pose(8)
    pts = np.random.default_rng(9).normal(size=(20, 3)).astype(np.float32)
    got = np.asarray(transform_points(jnp.asarray(t), jnp.asarray(pts)))
    want = pts @ t[:3, :3].T + t[:3, 3]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gauss_newton_pose_step_recovers_small_offset():
    """Hybrid point-to-plane Gauss-Newton recovers a small rigid offset."""
    from triplet_match_tpu.core.transforms import gauss_newton_pose_step, transform_points

    rng = np.random.default_rng(0)
    # three mutually perpendicular faces + an edge line: full rank (two
    # parallel planes alone would leave in-plane translation unconstrained —
    # the defining property of point-to-plane)
    n_f = 80
    f1 = np.stack([rng.uniform(-1, 1, n_f), rng.uniform(-1, 1, n_f), np.zeros(n_f)], 1)
    f2 = np.stack([rng.uniform(-1, 1, n_f), np.zeros(n_f), rng.uniform(-1, 1, n_f)], 1)
    f3 = np.stack([np.zeros(n_f), rng.uniform(-1, 1, n_f), rng.uniform(-1, 1, n_f)], 1)
    e = np.stack([rng.uniform(-1, 1, n_f), np.zeros(n_f), np.zeros(n_f)], 1)
    dst = np.concatenate([f1, f2, f3, e]).astype(np.float32)
    m_dir = np.concatenate([
        np.tile([0, 0, 1.0], (n_f, 1)),  # face normals
        np.tile([0, 1.0, 0], (n_f, 1)),
        np.tile([1.0, 0, 0], (n_f, 1)),
        np.tile([1.0, 0, 0], (n_f, 1)),  # edge tangents
    ]).astype(np.float32)
    m_kind = np.concatenate([np.zeros(3 * n_f, bool), np.ones(n_f, bool)])

    off = np.eye(4, dtype=np.float32)
    off[:3, :3] = rotation_matrix([0.3, 1, 0.2], 0.02)
    off[:3, 3] = [0.01, -0.005, 0.008]
    src = np.asarray(transform_points(jnp.asarray(off), jnp.asarray(dst)))
    w = np.ones(dst.shape[0], np.float32)

    upd = gauss_newton_pose_step(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(m_dir), jnp.asarray(m_kind),
        jnp.asarray(w),
    )
    # applying the update should undo the offset (up to linearization error)
    dt, dr = pose_delta(jnp.asarray(np.linalg.inv(off).astype(np.float32)), upd)
    assert float(dt) < 2e-4
    assert float(np.degrees(float(dr))) < 0.02
