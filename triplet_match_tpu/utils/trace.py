"""On-device tracing via jax.profiler.

SURVEY §5 (tracing/profiling): the reference's instrumentation is a chrono
stopwatch + streaming averages printed from the hot loop
(/root/reference/include/impl/scene.hpp:259-264, 357-359, impl/timer.hpp).
The TPU-native equivalents are :class:`triplet_match_tpu.utils.timer.Profiler`
(host wall-clock per phase, fed into search statistics) and this module —
a thin wrapper over ``jax.profiler`` that captures a full XLA device trace
viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def device_trace(log_dir: str, *sync_values):
    """Capture a jax.profiler trace of the enclosed block.

    Usage::

        with device_trace("/tmp/tm_trace", result_to_sync):
            result_to_sync = search_round(...)

    Pass the values produced inside the block so the trace brackets the
    actual device work (async dispatch otherwise escapes the region).
    View with ``tensorboard --logdir <log_dir>`` or the Perfetto UI.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        if sync_values:
            jax.block_until_ready(sync_values)
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation) for host phases."""
    import jax

    return jax.profiler.TraceAnnotation(name)
