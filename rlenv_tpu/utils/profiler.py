"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock prints
(`mcts_custom_trainer.py:296,318`; SURVEY.md §5). Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-viewable trace of device execution.
* :class:`Throughput` — simple steps/s counter with EMA smoothing for
  host-side progress reporting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace under ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """steps/s tracker: call ``update(total_steps)`` after each chunk."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self._last_steps: Optional[int] = None
        self._last_time: Optional[float] = None
        self.rate: float = 0.0

    def update(self, total_steps: int) -> float:
        now = time.perf_counter()
        if self._last_steps is not None:
            dt = max(now - self._last_time, 1e-9)
            inst = (total_steps - self._last_steps) / dt
            self.rate = (self.smoothing * self.rate
                         + (1 - self.smoothing) * inst
                         if self.rate else inst)
        self._last_steps = total_steps
        self._last_time = now
        return self.rate
