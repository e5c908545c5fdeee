"""Tests for the linear octree and utils (timer/progress/debug)."""

import io

import numpy as np
import pytest

from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.ops.octree import from_pointcloud, morton_codes
from triplet_match_tpu.utils.debug import to_grayscale_image, feature_histograms
from triplet_match_tpu.utils.progress import ProgressBar
from triplet_match_tpu.utils.timer import StreamingAverage, Timer


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    return PointCloud.from_arrays(xyz)


def test_octree_partitions_all_points(cloud):
    tree = from_pointcloud(cloud, max_depth=5, criterion="max_point_count", value=16)
    leaves = list(tree.leaf_traversal())
    covered = np.concatenate([tree.leaf_points(l) for l in leaves])
    assert sorted(covered.tolist()) == list(range(500))
    # leaf criterion respected (up to max_depth cutoff)
    for l in leaves:
        if tree.depth[l] < tree.max_depth:
            assert tree.point_count[l] <= 16


def test_octree_points_inside_node_bbox(cloud):
    tree = from_pointcloud(cloud, max_depth=4, value=8)
    xyz = np.asarray(cloud.xyz)
    for l in list(tree.leaf_traversal())[:20]:
        pts = xyz[tree.leaf_points(l)]
        assert np.all(pts >= tree.bbox_lo[l] - 1e-4)
        assert np.all(pts <= tree.bbox_hi[l] + 1e-4)


def test_octree_traversals_consistent(cloud):
    tree = from_pointcloud(cloud, max_depth=4, value=8)
    n = tree.node_count
    assert sorted(tree.depth_traversal()) == list(range(n))
    assert sorted(tree.breadth_traversal()) == list(range(n))
    assert set(tree.leaf_traversal()) | set(tree.branch_traversal()) == set(range(n))
    lv0 = list(tree.level_traversal(0))
    assert lv0 == [0]
    # depth-first preorder visits parents before children
    seen = set()
    for i in tree.depth_traversal():
        p = int(tree.parent[i])
        assert p == -1 or p in seen
        seen.add(i)


def test_morton_locality():
    import jax.numpy as jnp

    xyz = jnp.asarray(np.array([[0, 0, 0], [0.01, 0.01, 0.01], [0.99, 0.99, 0.99]], np.float32))
    codes = np.asarray(morton_codes(xyz, jnp.zeros(3), jnp.ones(3), 8))
    assert codes[0] == codes[1] or abs(int(codes[0]) - int(codes[1])) < abs(int(codes[0]) - int(codes[2]))


def test_timer_and_average():
    t = Timer().start()
    _ = sum(range(10000))
    ms = t.stop()
    assert ms >= 0.0
    avg = StreamingAverage()
    for x in [1.0, 2.0, 3.0]:
        avg.update(x)
    assert abs(avg.value - 2.0) < 1e-12


def test_progress_bar_renders():
    buf = io.StringIO()
    pb = ProgressBar(prefix="match ", width=10, stream=buf)
    pb.poll(0.5)
    pb.finish()
    out = buf.getvalue()
    assert "50.0%" in out and "100.0%" in out


def test_pgm_dump(tmp_path):
    path = str(tmp_path / "m.pgm")
    to_grayscale_image(path, np.arange(12, dtype=np.float32).reshape(3, 4))
    data = open(path, "rb").read()
    assert data.startswith(b"P5\n4 3\n255\n")
    assert data[-1] == 255 and data[len(b"P5\n4 3\n255\n")] == 0


def test_feature_histograms(tmp_path):
    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import make_box_model

    xyz, nrm, tan = make_box_model(n_edge=96, n_face=192, size=(1, 1, 1), seed=0)
    m = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DiscretizationParams(),
                      SampleParams(min_diameter_factor=0.2), SearchPolicy(), pair_block=128)
    p = str(tmp_path / "out0.dat")
    h0, h1 = feature_histograms(m, p)
    assert h0.sum() == int(m.pair_count) == h1.sum()
    lines = open(p).read().splitlines()
    assert len(lines) == 2


def test_octree_min_voxel_size_gates_on_min_extent():
    """min_voxel_size follows the reference's minCoeff rule
    (impl/octree.hpp:100): a flat slab whose smallest extent is already
    below 2*value stays a single leaf; an isotropic cloud subdivides."""
    rng = np.random.default_rng(3)
    xyz = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    xyz[:, 2] *= 0.01  # 1 x 1 x 0.01 slab
    flat = PointCloud.from_arrays(xyz)
    tree = from_pointcloud(flat, max_depth=6, criterion="min_voxel_size", value=0.1)
    assert len(list(tree.leaf_traversal())) == 1
    cube = PointCloud.from_arrays(rng.uniform(0, 1, (300, 3)).astype(np.float32))
    tree2 = from_pointcloud(cube, max_depth=6, criterion="min_voxel_size", value=0.1)
    assert len(list(tree2.leaf_traversal())) > 1
