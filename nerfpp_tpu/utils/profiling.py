"""Profiling & tracing hooks.

The reference has no profiling at all (SURVEY.md §5: a dead steady_clock
timestamp, NeRFExecutor.h:861/997). Here: a context manager around
``jax.profiler`` traces (view in TensorBoard/XProf or Perfetto) and a
lightweight step timer with EMA throughput used by the train loop.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir, enabled: bool = True):
    """Capture a device trace for the enclosed steps into ``log_dir``."""
    import jax
    if not enabled:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timing + throughput accounting."""

    def __init__(self, rays_per_step: int, ema: float = 0.9):
        self.rays_per_step = rays_per_step
        self.ema = ema
        self._last = None
        self.step_time = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (dt if self.step_time is None
                              else self.ema * self.step_time + (1 - self.ema) * dt)
        self._last = now

    @property
    def rays_per_sec(self) -> float:
        if not self.step_time:
            return 0.0
        return self.rays_per_step / self.step_time
