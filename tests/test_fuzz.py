"""Property fuzz: randomized (scene, policy) configurations through the
full search with the driver's structural invariants asserted.

The point-wise correctness tests (test_e2e_search, test_degenerate_inputs)
pin specific behaviors; this sweep pins the CONTRACTS that must hold for
any configuration (the reference enforces them by construction in its
sequential loop, impl/scene.hpp:193-237):

  * accepted matches claim only valid scene points, each at most once
    across ALL matches of a search (the greedy masking protocol);
  * every accepted match's claimed-corr count clears
    ``model_match_factor * n_model_all`` (the acceptance gate);
  * transforms are rigid (orthonormal rotation, det +1);
  * a planted instance in light clutter is recovered with a sub-5mm pose.

Seeds are fixed — this is a deterministic sweep over a randomized
configuration grid, not a flaky generator.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.index.model import compile_model
from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
from triplet_match_tpu.search.driver import find_all, prepare_scene

DISC = DiscretizationParams()
SAMPLE = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)


@pytest.fixture(scope="module")
def model_and_cloud():
    xyz, nrm, tan = make_box_model(n_edge=200, n_face=600, size=(1.0, 0.8, 0.6), seed=0)
    policy = SearchPolicy(num_first_samples=32, num_second_samples=8, query_cap=8,
                          score_neighbors=128, finalists=4, max_rounds=2)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), DISC, SAMPLE, policy)
    return (xyz, nrm, tan), model


def _configs():
    rng = np.random.default_rng(42)
    for i in range(6):
        yield {
            "seed": int(rng.integers(0, 1 << 16)),
            "n_clutter": int(rng.integers(100, 900)),
            "noise": float(rng.uniform(0.0, 0.003)),
            "capacity_pad": int(rng.choice([0, 17, 256])),
            "num_first_samples": int(rng.choice([16, 32, 48])),
            "score_neighbors": int(rng.choice([64, 128, 256])),
            "finalists": int(rng.choice([2, 4])),
            "model_match_factor": float(rng.choice([0.4, 0.5])),
            "plant_instance": bool(i != 3),  # one pure-clutter config
        }


@pytest.mark.parametrize("cfg", list(_configs()),
                         ids=lambda c: f"s{c['seed']}_c{c['n_clutter']}")
def test_search_invariants_random_config(model_and_cloud, cfg):
    (xyz, nrm, tan), model = model_and_cloud
    policy = SearchPolicy(
        num_first_samples=cfg["num_first_samples"], num_second_samples=8,
        query_cap=8, score_neighbors=cfg["score_neighbors"],
        finalists=cfg["finalists"], max_rounds=2,
    )
    if cfg["plant_instance"]:
        scene, t_gt, _ = embed_in_scene(
            xyz, nrm, tan, noise=cfg["noise"], n_clutter=cfg["n_clutter"],
            seed=cfg["seed"],
            capacity=(xyz.shape[0] + cfg["n_clutter"] + cfg["capacity_pad"])
            if cfg["capacity_pad"] else None,
        )
    else:
        rng = np.random.default_rng(cfg["seed"])
        c = rng.uniform(-4, 4, (cfg["n_clutter"] + 600, 3)).astype(np.float32)
        n = rng.normal(size=c.shape).astype(np.float32)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        scene, t_gt = PointCloud.from_arrays(c, n, np.zeros_like(c)), None

    matches = find_all(
        model, scene, policy=policy, sample_params=SAMPLE, discretization=DISC,
        model_match_factor=cfg["model_match_factor"], seed=cfg["seed"] % 97,
    )

    n_all = int(model.n_all)
    valid = np.asarray(scene.valid)
    claimed: set[int] = set()
    for m in matches:
        # rigid transform
        r = m.transform[:3, :3]
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-3)
        assert np.linalg.det(r) > 0.9
        # claimed corrs: valid scene points, unique across all matches
        corrs = np.asarray(m.scene_corrs)
        assert corrs.size > 0
        assert valid[corrs].all()
        s = set(corrs.tolist())
        assert len(s) == corrs.size  # no dup within a match
        assert not (s & claimed)  # greedy claiming across matches
        claimed |= s
        # acceptance gate (impl/scene.hpp:219-224): claimed corrs clear the
        # configured fraction of the model
        assert corrs.size >= cfg["model_match_factor"] * n_all * 0.999

    if cfg["plant_instance"] and cfg["n_clutter"] <= 600 and matches:
        from triplet_match_tpu.core.transforms import pose_delta

        deltas = [pose_delta(m.transform, jnp.asarray(t_gt)) for m in matches]
        dt = min(float(d[0]) for d in deltas)
        assert dt < 5e-3  # some accepted match is the planted instance
