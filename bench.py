"""Benchmark: pose hypotheses scored per second on one chip.

The north-star metric (BASELINE.json: >= 1e6 hypotheses/sec/chip on TPU
v5e).  Each "hypothesis scored" = one candidate pose pushed through the
``project_`` equivalent: transform its neighborhood (K scene points),
voxel-LUT lookup, distance + tangent-kind gates, orientation scoring —
mirroring /root/reference/include/impl/scene.hpp:411-510 per pose.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1e6 (the BASELINE.json target; the reference
publishes no numbers of its own — see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import prepare_scene
    from triplet_match_tpu.search.score import get_bench_scorer

    on_tpu = jax.devices()[0].platform != "cpu"
    # Benchmark shape: H poses x K-point neighborhoods against a model LUT.
    H = 131072 if on_tpu else 2048
    K = 512 if on_tpu else 64
    n_scene = 131072 if on_tpu else 2048
    n_model_edge, n_model_face = (600, 1800) if on_tpu else (180, 540)

    policy = SearchPolicy()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    disc = DiscretizationParams()

    xyz, nrm, tan = make_box_model(n_edge=n_model_edge, n_face=n_model_face, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample, policy)
    scene, t_gt, _ = embed_in_scene(
        xyz, nrm, tan, noise=0.001, n_clutter=n_scene - xyz.shape[0], clutter_extent=6.0, seed=3
    )
    prep = prepare_scene(scene, policy)

    # Hypothesis batch: perturbations of the true pose + random poses —
    # representative of the RANSAC pose distribution (mix of near-hits and
    # misses hitting both the in-LUT and out-of-LUT code paths).
    rng = np.random.default_rng(0)
    t_inv = np.linalg.inv(np.asarray(t_gt)).astype(np.float32)
    ts = np.tile(t_inv, (H, 1, 1))
    ang = rng.normal(0, 0.3, H).astype(np.float32)
    ts[:, 0, 0] = np.cos(ang) * t_inv[0, 0] - np.sin(ang) * t_inv[1, 0]
    ts[:, :3, 3] += rng.normal(0, 0.5, (H, 3)).astype(np.float32)
    nbr_idx = rng.integers(0, n_scene, (H, K)).astype(np.int32)
    nbr_valid = np.ones((H, K), bool)

    n = prep.cloud.xyz.shape[0]
    consumed = jnp.zeros(n, bool)

    scorer = get_bench_scorer(chunk=8192 if on_tpu else 512)
    args = (
        model, prep.cloud, prep.tangent_mask, consumed,
        jnp.asarray(ts), jnp.asarray(nbr_idx), jnp.asarray(nbr_valid),
        jnp.float32(3.0),
    )

    # warmup/compile
    out = scorer(*args)
    jax.block_until_ready(out)

    iters = 10 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = scorer(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    value = H / dt
    print(json.dumps({
        "metric": "pose_hypotheses_scored_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "hypotheses/sec",
        "vs_baseline": round(value / 1.0e6, 4),
    }))


if __name__ == "__main__":
    main()
