"""Model self-symmetry detection (ROADMAP 7: pose-ambiguity reporting)."""

import numpy as np
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.index.symmetry import detect_self_symmetries, symmetry_equivalent
from triplet_match_tpu.io.synthetic import make_box_model, rotation_matrix

POLICY = SearchPolicy(num_first_samples=48, num_second_samples=16, query_cap=16,
                      score_neighbors=256, finalists=4)
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
DISC = DiscretizationParams()


def test_box_symmetry_orbit():
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE,
                          POLICY, pair_block=128)
    orbit = detect_self_symmetries(model, DISC, SAMPLE, POLICY, seed=0, rounds=3)

    # a box has the orbit {I, Rx(pi), Ry(pi), Rz(pi)}
    assert 2 <= orbit.shape[0] <= 4
    np.testing.assert_allclose(orbit[0], np.eye(4), atol=1e-6)
    want = [rotation_matrix(ax, np.pi) for ax in ([1, 0, 0], [0, 1, 0], [0, 0, 1])]
    for s in orbit[1:]:
        # every detected symmetry is one of the pi rotations
        assert any(np.abs(s[:3, :3] - w).max() < 0.1 for w in want), s
        assert np.linalg.norm(s[:3, 3]) < 0.05

    # symmetry-aware pose comparison: a pi-rotated pose is the same match
    t1 = np.eye(4, dtype=np.float32)
    sym = orbit[1] if orbit.shape[0] > 1 else np.eye(4, dtype=np.float32)
    t2 = (t1 @ sym).astype(np.float32)
    assert symmetry_equivalent(t1, t2, orbit)
    # a 90-degree rotation is NOT in the orbit
    t3 = np.eye(4, dtype=np.float32)
    t3[:3, :3] = rotation_matrix([0, 0, 1], np.pi / 2)
    assert not symmetry_equivalent(t1, t3, orbit)
