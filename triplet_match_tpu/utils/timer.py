"""Stopwatch + phase profiling.

Mirrors the reference ``timer`` (/root/reference/include/impl/timer.hpp:9-44)
and the hand-rolled streaming averages in ``find_in_subset``
(impl/scene.hpp:259-264, 357-359).  On-device timing must bracket with
``jax.block_until_ready``; route block outputs through the ``sync``
callable that ``Profiler.section`` yields and it does that for you.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timer:
    """Chrono stopwatch (impl/timer.hpp semantics: start/stop/reset, ms)."""

    def __init__(self):
        self._start = None
        self._elapsed = 0.0

    def start(self):
        self._start = time.perf_counter()
        return self

    def stop(self) -> float:
        if self._start is not None:
            self._elapsed += time.perf_counter() - self._start
            self._start = None
        return self._elapsed * 1e3

    def reset(self):
        self._start = None
        self._elapsed = 0.0

    @property
    def milliseconds(self) -> float:
        extra = time.perf_counter() - self._start if self._start is not None else 0.0
        return (self._elapsed + extra) * 1e3


class StreamingAverage:
    """Numerically-stable running mean (``average``, include/common:104-115)."""

    def __init__(self):
        self.count = 0
        self.value = 0.0

    def update(self, x: float) -> float:
        self.count += 1
        self.value += (x - self.value) / self.count
        return self.value


class Profiler:
    """Per-phase wall-clock accumulation with device sync."""

    def __init__(self):
        self.phases: dict[str, StreamingAverage] = defaultdict(StreamingAverage)

    @contextlib.contextmanager
    def section(self, name: str):
        """Time a phase.  Pass values produced INSIDE the block through the
        yielded ``sync`` (identity; block_until_ready before the stop stamp)
        so async device work is included::

            with profiler.section("round") as sync:
                out = sync(step(...))
        """
        import jax

        pending: list = []

        def sync(value):
            pending.append(value)
            return value

        t0 = time.perf_counter()
        yield sync
        if pending:
            jax.block_until_ready(pending)
        self.phases[name].update((time.perf_counter() - t0) * 1e3)

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v.value:.2f}ms (n={v.count})" for k, v in self.phases.items()
        )
