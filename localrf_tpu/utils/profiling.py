"""Profiling / observability hooks (SURVEY §5: the reference has none beyond
an it/s print, ref: train.py:540-544; we add jax.profiler traces and a
rays/sec counter).
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace into `logdir` (view with TensorBoard's
    profile plugin). No-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Sliding rays/sec + it/s counter."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def add(self, n_steps: int = 1):
        self._steps += n_steps

    @property
    def it_per_sec(self) -> float:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._steps / dt

    @property
    def rays_per_sec(self) -> float:
        return self.it_per_sec * self.batch_size
