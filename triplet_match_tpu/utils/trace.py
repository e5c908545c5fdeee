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
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block.

    Usage::

        with device_trace("/tmp/tm_trace") as sync:
            result = sync(search_round(...))

    Pass values produced inside the block through the yielded ``sync``
    (identity; registers them for ``block_until_ready`` before the trace
    stops) so the trace brackets the actual device work — async dispatch
    otherwise escapes the region.  View with ``tensorboard --logdir
    <log_dir>`` or the Perfetto UI.
    """
    import jax

    pending: list = []

    def sync(value):
        pending.append(value)
        return value

    jax.profiler.start_trace(log_dir)
    try:
        yield sync
    finally:
        if pending:
            jax.block_until_ready(pending)
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation) for host phases."""
    import jax

    return jax.profiler.TraceAnnotation(name)
