"""Multi-chip search over a jax.sharding.Mesh.

The search round shards three ways (PARITY.md "Parallelism"):
  dp  — each chip runs its own RANSAC chunk (hypothesis data parallelism),
  sp  — every scene-length array is sharded across chips,
  dcn — one RANSAC chunk per (slice, dp) pair, hierarchical finalist join.

This example runs a dp×sp mesh on 8 virtual CPU devices so it works on
one machine; on a real pod, drop the host-device flag and build the mesh
from ``jax.devices()`` (multi-host: see parallel/distributed.py and
scripts/dryrun_distributed.py).

    python examples/03_multichip_mesh.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from triplet_match_tpu.api import Model, Scene
    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud, pad_capacity
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.parallel.search2d import make_mesh_2d

    # off-TPU the Pallas scorer runs in interpret mode
    policy = SearchPolicy(pallas_interpret=True)
    disc = DiscretizationParams()
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)

    mesh = make_mesh_2d(dp=2, sp=4)
    print("mesh:", dict(mesh.shape))

    xyz, nrm, tan = make_box_model(n_edge=240, n_face=1200, size=(1, 0.8, 0.6), seed=0)
    model = Model(PointCloud.from_arrays(xyz, nrm, tan), disc).init(sample)
    scene_cloud, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.002,
                                          n_clutter=2000, seed=3)
    # sp-sharded scene arrays need capacity divisible by the sp extent
    scene_cloud = pad_capacity(scene_cloud, mesh.shape["sp"])

    matches = Scene(scene_cloud, policy).find_all_parallel(
        model, sample_params=sample, mesh=mesh)
    for m in matches:
        print("found: translation", np.round(np.asarray(m.transform)[:3, 3], 4),
              "corrs", len(m.scene_corrs))
    print("ground truth:      ", np.round(t_gt[:3, 3], 4))
    return 0 if matches else 2


if __name__ == "__main__":
    raise SystemExit(main())
