"""Tracing / profiling / metrics (SURVEY.md §5.1, §5.5).

The reference's only perf instrumentation is the DeltaTime frame timer
(delta_time.cppm:35-40). Here profiling is first-class:

  * ``trace(log_dir)`` — capture a jax.profiler device trace around a block
    (open in TensorBoard / xprof to see kernel timings);
  * ``annotate(name)`` — named host-side trace span;
  * ``Counters`` — named monotonically-increasing event counters (binning
    overflow drops, skipped assets, cache hits) for observability.
"""

from __future__ import annotations

import collections
import contextlib
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block with the JAX device profiler (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named span in the host trace timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class Counters:
    """Named event counters (process-wide observability)."""

    def __init__(self):
        self._counts: Dict[str, int] = collections.defaultdict(int)

    def add(self, name: str, value: int = 1) -> None:
        self._counts[name] += int(value)

    def get(self, name: str) -> int:
        return self._counts.get(name, 0)

    def snapshot(self) -> Dict[str, int]:
        return dict(self._counts)


counters = Counters()
