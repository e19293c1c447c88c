"""Profiling / tracing subsystem (SURVEY §5.1 — the reference has only a
get_FPS wall-clock loop; here: first-class jax.profiler integration).

Usage:
    with trace("/tmp/instseg_trace"):
        run_steps()                 # view in xprof/tensorboard

    t = StepTimer()
    for batch in loader:            # per-step wall times with ETA
        ...
        t.tick()
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace (xplane) viewable in TensorBoard's profile
    plugin / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """On-demand profiling server (connect with TensorBoard capture)."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Windowed step timing + ETA — the MetricLogger.log_every analogue
    (annotation/train_utils/distributed_utils.py:120-207)."""

    def __init__(self, total_steps: Optional[int] = None, window: int = 50):
        self.total = total_steps
        self.window = window
        self._times = []
        self._last = time.perf_counter()
        self.steps = 0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        self.steps += 1
        return dt

    @property
    def avg(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def eta_seconds(self) -> Optional[float]:
        if self.total is None:
            return None
        return (self.total - self.steps) * self.avg

    def summary(self) -> str:
        eta = self.eta_seconds
        eta_s = f", eta {eta / 60:.1f} min" if eta is not None else ""
        return f"{self.avg * 1000:.1f} ms/step{eta_s}"
