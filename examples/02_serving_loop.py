"""Serving loop: one compiled model library, a stream of scenes.

The deployment shape a reference library user hand-rolls (the reference
demo rebuilds everything per process).  ``Matcher`` buckets incoming
scene capacities into a handful of compiled programs; ``warmup``
precompiles the buckets before traffic; ``MultiMatcher`` shares one
scene prep across a model library with cross-model point claiming.

    python examples/02_serving_loop.py [--cpu]
"""

import os
import sys

# runnable without installation: put the repo root on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main() -> int:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from triplet_match_tpu.api import Model, MultiMatcher
    from triplet_match_tpu.config import DiscretizationParams, SampleParams
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model

    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)

    # a two-model library
    part_a = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    part_b = make_box_model(n_edge=240, n_face=720, size=(0.5, 0.5, 1.4), seed=1)
    library = [Model(PointCloud.from_arrays(*p), disc).init(sample)
               for p in (part_a, part_b)]

    matcher = MultiMatcher(library, min_capacity=2048)
    print("warming buckets:", matcher.warmup([1500, 3000], sample_params=sample,
                                             model_match_factor=0.5))

    # simulated traffic: variable-size scenes, each containing part A
    for i in range(3):
        xyz, nrm, tan = part_a
        scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001,
                                        n_clutter=400 + 300 * i, seed=100 + i)
        sv = np.asarray(scene.valid)
        cloud = PointCloud.from_arrays(np.asarray(scene.xyz)[sv],
                                       np.asarray(scene.normal)[sv],
                                       np.asarray(scene.tangent)[sv])
        t0 = time.perf_counter()
        per_model = matcher.match(cloud, sample_params=sample,
                                  model_match_factor=0.5, seed=13 + i)
        dt = time.perf_counter() - t0
        found = [len(r) for r in per_model]
        print(f"scene {i}: {cloud.capacity} pts -> matches per model {found} "
              f"in {dt:.2f}s (rounds={matcher.statistics.rounds}, "
              f"hypotheses={matcher.statistics.hypotheses_scored})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
