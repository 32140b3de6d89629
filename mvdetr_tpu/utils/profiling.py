"""Profiling helpers.

The reference's observability is manual wall-clock accumulators
(`/root/reference/multiview_detector/trainer.py:40-43,68-82`); here we keep
host-side step timing in the Trainer and add device-level tracing via
``jax.profiler`` for kernel-by-kernel breakdowns.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timer for steady-state step rates."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._last = None

    def tick(self):
        now = time.time()
        if self._last is not None:
            self.count += 1
            if self.count > self.warmup:
                self.total += now - self._last
        self._last = now

    @property
    def mean_step_s(self) -> float:
        steps = self.count - self.warmup
        return self.total / steps if steps > 0 else float("nan")

    @property
    def steps_per_s(self) -> float:
        s = self.mean_step_s
        return 1.0 / s if s and s == s and s > 0 else 0.0
