"""Recall-fixture diversification (VERDICT r4 weak #6).

The recall protocol had been a box-model monoculture (edge-rich, 600 edge
points).  Two adversarial families join it:

- **low-edge**: a nearly-smooth model (~3.5% classified edge points).  The
  fog-density switch auto-enables ``rank_edges_only`` whenever
  ``n_edge > 0`` (driver.find_all), so such a model ranks on a tiny, noisy
  edge statistic in fog scenes — recall must survive that.
- **big-bucket lattice**: a uniform wireframe scaffold whose discretized
  pair buckets hold hundreds of thousands of entries — far beyond the
  reference's ``query_limit=200`` (impl/scene.hpp:19) — pinning the
  even-stride bucket read (index/model.query_pairs reads
  ``min(query_cap, query_limit)`` of a sorted bucket where upstream walks
  an unordered_multimap, impl/model.hpp:169-178) at realistic bucket
  sizes.  Pose equality is asserted modulo the lattice's rigid self-map
  orbit (index/symmetry).

The hardware-scale companions run through ``scripts/recall_study.py
--model {low-edge,lattice}``.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.core.transforms import pose_delta
from triplet_match_tpu.index import model as im
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import make_lattice_model
from triplet_match_tpu.search import driver

DISC = DiscretizationParams()
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)


def test_low_edge_model_recall_under_edge_only_ranking():
    """A 3.5%-edge model in touching fog with the fog switch FORCED on:
    rank_edges_only auto-triggers and the instance must still be found
    sub-mm on the tiny edge statistic."""
    from recall_study import build_scene, model_arrays

    policy = SearchPolicy(scorer="pallas", pallas_interpret=True,
                          num_first_samples=64, max_rounds=2,
                          fine_full_rescore_ratio=2.0)  # force the switch
    arrays = model_arrays("low-edge")
    model = compile_model(PointCloud.from_arrays(*arrays), DISC, SAMPLE, policy)
    n_edge = int(model.n_edge)
    assert 0 < n_edge <= 0.05 * int(model.n_all), n_edge  # the adversarial premise

    scene, t_gt = build_scene(30000, 0, arrays=arrays)
    m = driver.find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                        sample_params=SAMPLE, discretization=DISC, policy=policy,
                        max_icp_iterations=10, seed=5)
    st = dict(driver.LAST_SEARCH_STATS)
    assert st.get("fine_rescore_full") is True
    assert st.get("rank_edges_only") is True  # the auto-trigger under test
    assert m, "low-edge instance lost under edge-only ranking"
    dt, dr = pose_delta(jnp.asarray(m[0].transform), jnp.asarray(t_gt))
    assert float(dt) < 1.5e-3 and float(np.degrees(float(dr))) < 0.5


def test_big_bucket_lattice_recall(monkeypatch):
    """Uniform lattice: pair buckets orders of magnitude past
    query_limit=200; the strided bucket read must still recover the pose
    (modulo the lattice's rigid self-map orbit)."""
    from recall_study import build_scene

    # the LUT only SEEDS finish_find/ICP correspondences (index/model.py
    # docstring); a coarse grid keeps the CPU-scale compile tractable for
    # this dense-resolution model (the full-size grid is a hardware path,
    # proven in the edge-dense study)
    monkeypatch.setattr(im, "_MAX_LUT_VOXELS", 1 << 21)
    policy = SearchPolicy(scorer="pallas", pallas_interpret=True,
                          num_first_samples=64, max_rounds=2)
    arrays = make_lattice_model(cells=2, n_edge=6000, graded=False, seed=0)
    model = compile_model(PointCloud.from_arrays(*arrays), DISC, SAMPLE, policy)

    keys = np.asarray(model.keys)
    _, counts = np.unique(keys[keys != im._INVALID_KEY], return_counts=True)
    assert int(counts.max()) > 200  # deviation-#2 regime actually stressed
    assert int((counts > 200).sum()) > 100

    scene, t_gt = build_scene(30000, 0, arrays=arrays)
    m = driver.find_all(model, scene, dist_thres=3.0, model_match_factor=0.5,
                        sample_params=SAMPLE, discretization=DISC, policy=policy,
                        max_icp_iterations=10, seed=5)
    assert m, "lattice instance lost"

    from triplet_match_tpu.index.symmetry import (
        detect_self_symmetries, symmetry_equivalent,
    )

    orbit = detect_self_symmetries(model)
    assert orbit.shape[0] >= 4  # the uniform lattice is genuinely symmetric
    assert symmetry_equivalent(np.asarray(m[0].transform), np.asarray(t_gt), orbit)
