"""Grid-bucketed neighbor op: parity vs brute-force kNN + prepare_scene path."""

import numpy as np
import jax
import jax.numpy as jnp

from triplet_match_tpu.config import SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
from triplet_match_tpu.ops.gridnn import build_grid, estimate_knn_radius, grid_neighbors
from triplet_match_tpu.ops.knn import knn


def _random_surface(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    # two crossing planes + a blob: non-uniform density
    a = rng.uniform(-1, 1, (n // 2, 2)).astype(np.float32)
    p1 = np.stack([a[:, 0], a[:, 1], 0.02 * rng.normal(size=n // 2).astype(np.float32)], 1)
    p2 = np.stack([a[:, 0], 0.02 * rng.normal(size=n // 2).astype(np.float32), a[:, 1]], 1)
    return np.concatenate([p1, p2]).astype(np.float32)


def test_grid_neighbors_matches_brute():
    xyz = jnp.asarray(_random_surface())
    valid = jnp.ones(xyz.shape[0], bool)
    k = 16

    cell = estimate_knn_radius(xyz, valid, k)
    grid = build_grid(xyz, valid, cell)
    gi, gm = grid_neighbors(grid, xyz, xyz, k, cap=64)
    bi, bd2 = knn(xyz, xyz, valid, k)

    # grid distances must never beat brute (it can only miss neighbors)...
    gd2 = jnp.sum((xyz[gi] - xyz[:, None, :]) ** 2, -1)
    gd2 = jnp.where(gm, gd2, jnp.inf)
    assert bool(jnp.all(jnp.sort(gd2, 1) >= jnp.sort(bd2, 1) - 1e-6))
    # ...and the k-th neighbor distance matches exactly for >=90% of queries
    # (cell = p90 of the k-NN radius -> one-ring covers >=90% of points)
    exact = jnp.abs(jnp.max(gd2, 1) - jnp.max(bd2, 1)) < 1e-6
    assert float(jnp.mean(exact.astype(jnp.float32))) >= 0.90


def test_grid_neighbors_radius_mask():
    xyz = jnp.asarray(_random_surface(2000, seed=1))
    valid = jnp.ones(xyz.shape[0], bool)
    cell = estimate_knn_radius(xyz, valid, 8)
    grid = build_grid(xyz, valid, cell)
    r = float(cell) * 0.5
    gi, gm = grid_neighbors(grid, xyz, xyz, 8, cap=64, radius=r)
    d2 = jnp.sum((xyz[gi] - xyz[:, None, :]) ** 2, -1)
    assert bool(jnp.all(~gm | (d2 <= r * r + 1e-6)))


def test_grid_neighbors_respects_validity():
    xyz = jnp.asarray(_random_surface(1000, seed=2))
    valid = jnp.arange(xyz.shape[0]) % 3 != 0
    cell = estimate_knn_radius(xyz, valid, 8)
    grid = build_grid(xyz, valid, cell)
    gi, gm = grid_neighbors(grid, xyz, xyz, 8, cap=64)
    # no invalid point ever appears as a masked-true neighbor
    assert not bool(jnp.any(gm & ~valid[gi]))


def test_prepare_scene_grid_matches_brute_edges():
    """The grid prepare path classifies edges like the brute path."""
    from triplet_match_tpu.search.driver import _prepare_scene_grid, _prepare_scene_whole

    policy = SearchPolicy()
    xyz, nrm, tan = make_box_model(n_edge=400, n_face=1200, size=(1.0, 0.8, 0.6), seed=0)
    scene, _, inst = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=3000,
                                    clutter_extent=5.0, seed=3)
    whole = _prepare_scene_whole(scene, policy)
    gridp = _prepare_scene_grid(scene, policy=policy, chunk=1024)

    tw = np.asarray(whole.tangent_mask)
    tg = np.asarray(gridp.tangent_mask)
    # identical classification up to a sub-percent boundary band
    assert (tw != tg).mean() < 0.01
    # instance edge recall at least as good as brute
    inst_edges_possible = np.asarray(
        jnp.linalg.norm(scene.tangent, axis=-1) > policy.tangent_norm_threshold
    ) & np.asarray(inst)
    rec_w = tw[inst_edges_possible].mean()
    rec_g = tg[inst_edges_possible].mean()
    # never worse than brute (at this scale both see exact neighborhoods;
    # the ~0.67 ceiling is the curvature ratio under noise, not the op)
    assert rec_g >= rec_w - 0.01
    assert rec_g > 0.5


def test_grid_cell_edge_never_below_requested():
    """dims must round DOWN so the effective edge stays >= cell_size:
    ceil shrank the edge to ~0.7*cell at ext = 2.1*cell, and in-radius
    neighbors two cells away fell outside the stencil (review round 3)."""
    rng = np.random.default_rng(5)
    cell = 1.0
    xyz = jnp.asarray(rng.uniform(0, 2.1, (400, 3)).astype(np.float32))
    v = jnp.ones(400, bool)
    grid = build_grid(xyz, v, cell)
    k = 8
    gi, gm = grid_neighbors(grid, xyz, xyz, k, cap=400, radius=cell)
    bi, bd2 = knn(xyz, xyz, v, k)
    bm = bd2 <= cell * cell
    gd2 = jnp.sum((xyz[gi] - xyz[:, None, :]) ** 2, -1)
    gs = jnp.sort(jnp.where(gm, gd2, jnp.inf), 1)
    bs = jnp.sort(jnp.where(bm, bd2, jnp.inf), 1)
    both_inf = ~jnp.isfinite(gs) & ~jnp.isfinite(bs)
    diff = jnp.where(both_inf, 0.0, jnp.abs(gs - bs))
    assert bool(jnp.all(diff < 1e-6))
