"""Profiling utilities.

The reference has no tracing/profiling beyond ad-hoc time.time() in CLIs
(SURVEY.md §5).  Here: a ``trace`` context manager around ``jax.profiler``
(produces TensorBoard-compatible traces of the XLA programs on the chip) and
a ``StepTimer`` that reproduces the reference CLIs' throughput report format
(llm/llama/infer.py:62-64).
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): step()``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter: items/sec over wall-clock, reference report style."""

    def __init__(self) -> None:
        self.reset()

    def reset(self):
        self._start = time.time()
        self._count = 0

    def step(self, n: int = 1):
        self._count += n

    @property
    def elapsed(self) -> float:
        return time.time() - self._start

    @property
    def rate(self) -> float:
        e = self.elapsed
        return self._count / e if e > 0 else 0.0

    def report(self, unit: str = "tokens") -> str:
        return (f"{unit.capitalize()} count: {self._count}, "
                f"elapsed: {self.elapsed:.2f}s, "
                f"{round(self.rate)} {unit}/s")
