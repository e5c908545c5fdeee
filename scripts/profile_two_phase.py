"""Phase-split microbenchmark of the two-phase scorer on bench shapes.

Times each stage of score_groups_two_phase in isolation — the coarse
ranking kernel, the fine rescore kernel, and the XLA glue (top_k +
take_along_axis + scatter) — to show where the per-pose nanoseconds go.
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tmtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.search.driver import prepare_scene
    from triplet_match_tpu.search import score_pallas as sp

    G, HG, K = 256, 512, 512
    policy = SearchPolicy()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    xyz, nrm, tan = make_box_model(n_edge=600, n_face=1800, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan),
                          DiscretizationParams(), sample, policy)
    scene, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.001, n_clutter=131072 - xyz.shape[0],
                                    clutter_extent=6.0, seed=3)
    prep = prepare_scene(scene, policy)
    rng = np.random.default_rng(0)
    t_inv = np.linalg.inv(np.asarray(t_gt)).astype(np.float32)
    ts = np.tile(t_inv, (G, HG, 1, 1))
    ts[..., :3, 3] += rng.normal(0, 0.5, (G, HG, 3)).astype(np.float32)
    nbr_idx = jnp.asarray(rng.integers(0, 131072, (G, K)).astype(np.int32))
    consumed = jnp.zeros(prep.cloud.xyz.shape[0], bool)
    thres = 3.0 * float(model.resolution)
    t2 = thres * thres

    mpack = sp.pack_model(model, coarse_points=policy.coarse_model_points)
    groups = sp.pack_groups(prep.cloud, prep.tangent_mask, consumed, nbr_idx,
                            jnp.ones((G, K), bool))
    rows = sp.poses_to_rows(jnp.asarray(ts))
    stride = policy.two_phase_stride
    keep_frac = policy.two_phase_keep_frac
    coarse = groups[:, :, ::stride]
    keep = max(16, -(-(HG // keep_frac) // 16) * 16)
    kept = jnp.tile(jnp.arange(keep, dtype=jnp.int32)[None], (G, 1))
    poses_kept = jnp.take_along_axis(rows, kept[..., None], axis=1)

    n_pose = G * HG
    t2c = (thres + float(mpack.coarse_slack)) ** 2

    t_coarse = timeit(
        lambda: sp.score_groups_coarse(mpack, coarse, rows, t2c, pose_tile=16))
    print(json.dumps({"stage": "coarse_kernel", "s": round(t_coarse, 5),
                      "ns_per_pose": round(t_coarse / n_pose * 1e9, 1)}), flush=True)

    t_fine = timeit(
        lambda: sp.score_groups_pallas(mpack, groups, poses_kept, t2,
                                       mode="count", pose_tile=16))
    print(json.dumps({"stage": "fine_kernel", "s": round(t_fine, 5),
                      "ns_per_pose": round(t_fine / n_pose * 1e9, 1)}), flush=True)

    @jax.jit
    def glue(s1, rows):
        _, kept = jax.lax.top_k(s1, keep)
        pk = jnp.take_along_axis(rows, kept[..., None], axis=1)
        out = jnp.full((G, HG), -1.0, jnp.float32)
        out = jax.vmap(lambda o, i, v: o.at[i].set(v))(out, kept, jnp.ones((G, keep)))
        return pk, out

    s1 = jnp.zeros((G, HG), jnp.float32)
    t_glue = timeit(lambda: glue(s1, rows))
    print(json.dumps({"stage": "glue_topk_gather_scatter", "s": round(t_glue, 5),
                      "ns_per_pose": round(t_glue / n_pose * 1e9, 1)}), flush=True)

    t_all = timeit(
        lambda: sp.score_groups_two_phase(mpack, groups, rows, t2, mode="count",
                                          pose_tile=16, coarse_stride=stride,
                                          keep_frac=keep_frac))
    print(json.dumps({"stage": "two_phase_total", "s": round(t_all, 5),
                      "ns_per_pose": round(t_all / n_pose * 1e9, 1),
                      "poses_per_sec": round(n_pose / t_all, 1)}), flush=True)


if __name__ == "__main__":
    main()
