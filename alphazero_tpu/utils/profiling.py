"""Profiling hooks (SURVEY.md §5 tracing row).

The reference's only instrumentation is wall-clock prints (train.py:61-82).
Here: steps/s / sims/s are first-class metrics (utils/metrics.py, emitted by
Trainer.collect), and device-level traces come from ``jax.profiler`` —
wrap any region with :func:`trace` and open the dump in TensorBoard or
Perfetto.  ``annotate`` adds named spans visible in the trace timeline.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region into ``log_dir``
    (no-op when ``log_dir`` is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span context manager for trace timelines."""
    return jax.profiler.TraceAnnotation(name)
