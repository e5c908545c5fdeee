"""Basic match: compile a model, search one scene, print the pose.

The five-line port of the reference demo
(/root/reference/apps/triplet_match.cpp:13-35) — see MIGRATION.md for the
call-by-call mapping.  Runs anywhere; pass --cpu off-TPU.

    python examples/01_basic_match.py model.pcd scene.pcd [--cpu]

Without arguments it builds a synthetic box-in-clutter scene so the
example is runnable out of the box.
"""

import os
import sys

# runnable without installation: put the repo root on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from triplet_match_tpu.api import Model, Scene
    from triplet_match_tpu.config import DiscretizationParams, SampleParams
    from triplet_match_tpu.core.cloud import PointCloud

    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)

    if len(args) >= 2:
        from triplet_match_tpu.io.pcd import read_pcd

        model_cloud, scene_cloud = read_pcd(args[0]), read_pcd(args[1])
    else:
        from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model

        xyz, nrm, tan = make_box_model(n_edge=240, n_face=1200, size=(1, 0.8, 0.6), seed=0)
        model_cloud = PointCloud.from_arrays(xyz, nrm, tan)
        scene_cloud, t_gt, _ = embed_in_scene(xyz, nrm, tan, noise=0.002,
                                              n_clutter=800, seed=3)
        print("(synthetic scene; ground-truth translation:", np.round(t_gt[:3, 3], 3), ")")

    model = Model(model_cloud, DiscretizationParams()).init(sample)
    scene = Scene(scene_cloud)
    matches = scene.find_all_parallel(model, dist_thres=3.0,
                                      model_match_factor=0.4,
                                      sample_params=sample)
    for i, m in enumerate(matches):
        print(f"match {i}: score={m.signed_score:.3f} corrs={len(m.scene_corrs)}")
        print(np.array_str(np.asarray(m.transform), precision=4, suppress_small=True))
    return 0 if matches else 2


if __name__ == "__main__":
    raise SystemExit(main())
