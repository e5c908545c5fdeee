"""Device mesh helpers.

The reference's only parallelism is ``std::async`` over RANSAC chunks and
OpenMP over voxels (/root/reference/include/impl/scene.hpp:146-166,
impl/model.hpp:81).  The TPU-native analog is a 1-D ``jax.sharding.Mesh``
over chips: hypothesis batches shard like the async chunks (data parallel),
scene points shard for huge scenes (the "sequence parallel" analog —
SURVEY §5 long-context note).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

HYP_AXIS = "chips"


def make_mesh(n_devices: int | None = None, axis: str = HYP_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        # error, not silent truncation: a user asking for --dp 8 on a
        # 4-device host would otherwise get half the sampling throughput
        # with no hint (the 2-/3-axis factories already assert)
        assert len(devs) >= n_devices, (
            f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
