"""Multi-host entry: ``jax.distributed`` process init + host-spanning meshes.

The reference is a single-process library (``std::async`` threads only,
/root/reference/include/impl/scene.hpp:146-166); its "multi-node story" is
nonexistent (SURVEY §2 parallelism table).  The TPU-native plan (SURVEY
§7.11) is standard JAX multi-controller SPMD: one Python process per host,
``jax.distributed.initialize`` to form the global runtime, meshes built
over ``jax.devices()`` (the GLOBAL device list), and the existing
``parallel/search2d.py`` shardings run unchanged — dp/sp axes laid out so
collectives ride ICI within a host/slice and DCN across.

Conventions for multi-controller use of this package:

* every process must pass IDENTICAL host values (model arrays, policy,
  keys) into the jitted round — plain numpy inputs are treated as
  fully-replicated global values;
* scene-length arrays become global sharded Arrays via
  :func:`make_global_cloud` / :func:`make_global_array` (each process
  supplies the full local copy; JAX slices out the shards it owns);
* ``driver.find_all``'s host loop reads back only fully-replicated
  outputs: under ``jax.process_count() > 1`` it requests
  ``replicate_outputs=True`` from ``search_round_2d`` (the sp-sharded
  consumed/fp/new_corr/model_idx outputs are all-gathered over sp inside
  the round), so every np.asarray read is fully addressable and the loop
  runs identically on every process.

Validated by ``scripts/dryrun_distributed.py``: 2 CPU processes x 4
virtual devices each form an 8-device (dp, sp) mesh and run one
``search_round_2d`` that accepts the planted instance.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

# single home for the axis-name contract: search_round_2d resolves axes by
# these names (mesh.shape[DP_AXIS], lax.axis_index(SP_AXIS))
from triplet_match_tpu.parallel.search2d import DCN_AXIS, DP_AXIS, SP_AXIS  # noqa: F401


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               **kwargs) -> None:
    """Join (or form) the multi-process JAX runtime.

    Thin wrapper over ``jax.distributed.initialize``; arguments default to
    the standard env vars (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) so launchers can configure via environment only.
    Idempotent: a second call in an initialized process is a no-op.
    """
    import jax

    if jax.distributed.is_initialized():
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def make_global_mesh(shape: dict[str, int]):
    """Mesh over the GLOBAL device list (all hosts), e.g.
    ``make_global_mesh({"dp": 2, "sp": 4})``.

    Axis order follows the dict; keep scene-sharding ("sp") as the LAST
    (fastest-varying) axis so its collectives stay within a host/slice on
    standard device orderings — the hierarchical-join layout of
    parallel/search2d.py.
    """
    import jax
    from jax.sharding import Mesh

    names = tuple(shape.keys())
    sizes = tuple(shape.values())
    n = int(np.prod(sizes))
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(f"mesh {shape} needs {n} devices, runtime has {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(sizes), names)


def make_global_array(mesh, spec, host_value: np.ndarray):
    """Build a global sharded Array from a full process-local copy.

    Every process passes the SAME full ``host_value``; each materializes
    only the shards it owns (``jax.make_array_from_callback``).  In a
    single-process runtime this is equivalent to ``jax.device_put`` with a
    ``NamedSharding``.
    """
    import jax
    from jax.sharding import NamedSharding

    host_value = np.asarray(host_value)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        host_value.shape, sharding, lambda idx: host_value[idx]
    )


def make_global_cloud(mesh, cloud, axis: str = SP_AXIS):
    """Shard a PointCloud's point axis over ``axis`` as global Arrays.

    ``cloud`` holds full process-local (replicated) arrays; the result is
    the scene input ``parallel.search2d.search_round_2d`` expects.  The
    axis extent must divide the point capacity (pad the capacity to a
    multiple of the sp extent, not the other way around).
    """
    from jax.sharding import PartitionSpec as P

    def shard(a):
        a = np.asarray(a)
        spec = P(axis) if a.ndim >= 1 else P()
        return make_global_array(mesh, spec, a)

    return dataclasses.replace(
        cloud,
        xyz=shard(cloud.xyz),
        normal=shard(cloud.normal),
        tangent=shard(cloud.tangent),
        valid=shard(cloud.valid),
    )
