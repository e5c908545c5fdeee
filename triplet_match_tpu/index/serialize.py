"""Compiled-model serialization.

The reference rebuilds its indexes from scratch every run
(impl/model.hpp:15-167); the compiled model here is pure arrays, so saving
and loading it is a cheap win (SURVEY §5 checkpoint/resume).  Format: npz.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.index.model import CompiledModel

_CLOUD_FIELDS = ("xyz", "normal", "tangent", "valid")
_MODEL_FIELDS = (
    "resolution", "diameter", "to_voxel", "lut", "edge", "bounds_min",
    "bounds_max", "keys", "pairs", "pair_count", "n_edge", "n_all",
)


def save_model(path: str, model: CompiledModel, discretization=None) -> None:
    """Save a compiled model; pass the DiscretizationParams it was compiled
    with so loads can reuse them — the pair-table keys are quantized under
    those params, and querying with different ones silently misses every
    bucket."""
    data = {f"cloud_{k}": np.asarray(getattr(model.cloud, k)) for k in _CLOUD_FIELDS}
    data.update({k: np.asarray(getattr(model, k)) for k in _MODEL_FIELDS})
    data["margin"] = np.int32(model.margin)
    if discretization is not None:
        data["disc_distance_step_count"] = np.int32(discretization.distance_step_count)
        data["disc_angle_step"] = np.float64(discretization.angle_step)
        data["disc_curvature_ratio_step_count"] = np.int32(
            discretization.curvature_ratio_step_count)
    # np.savez_compressed silently appends ".npz" to suffix-less paths —
    # write through a file object so the file lands at the LITERAL path
    # the caller logged and load_model will open
    with open(path, "wb") as f:
        np.savez_compressed(f, **data)


def load_model(path: str) -> CompiledModel:
    with np.load(path) as z:
        cloud = PointCloud(**{k: jnp.asarray(z[f"cloud_{k}"]) for k in _CLOUD_FIELDS})
        fields = {k: jnp.asarray(z[k]) for k in _MODEL_FIELDS}
        return CompiledModel(cloud=cloud, margin=int(z["margin"]), **fields)


def load_discretization(path: str):
    """DiscretizationParams stored with the model, or None (pre-r3 files)."""
    with np.load(path) as z:
        if "disc_distance_step_count" not in z:
            return None
        from triplet_match_tpu.config import DiscretizationParams

        return DiscretizationParams(
            distance_step_count=int(z["disc_distance_step_count"]),
            angle_step=float(z["disc_angle_step"]),
            curvature_ratio_step_count=int(z["disc_curvature_ratio_step_count"]),
        )
