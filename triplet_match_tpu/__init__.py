"""triplet_match_tpu — TPU-native point-cloud rigid matching.

Public surface (see README.md / PARITY.md):

    from triplet_match_tpu import Model, Scene, PointCloud
    from triplet_match_tpu import SampleParams, DiscretizationParams, SearchPolicy
"""

from triplet_match_tpu.config import (
    DiscretizationParams,
    SampleParams,
    SearchPolicy,
)
from triplet_match_tpu.core.cloud import PointCloud

__version__ = "0.1.0"

__all__ = [
    "DiscretizationParams",
    "Model",
    "PointCloud",
    "SampleParams",
    "Scene",
    "SearchPolicy",
    "__version__",
]


def __getattr__(name):
    # Model/Scene import jax-heavy modules; keep top-level import light.
    if name in ("Model", "Scene"):
        from triplet_match_tpu import api

        return getattr(api, name)
    raise AttributeError(f"module 'triplet_match_tpu' has no attribute {name!r}")
