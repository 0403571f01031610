"""Profiling / metering utilities.

The reference's only performance surface is the measured sample rate
(reference include/Suscan/Analyzer.h:137-141) and per-task rates
(SURVEY.md §5.1).  The TPU build adds:

- :class:`SampleRateMeter` — the user-facing samples/s follower;
- :class:`StageTimer`    — per-stage wall time accounting for the
  pipeline (host framing vs device step vs host drain);
- :func:`trace`          — context manager around ``jax.profiler`` for
  device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass


class SampleRateMeter:
    """EMA samples/s meter (measured_sample_rate equivalent)."""

    def __init__(self, alpha: float = 0.2) -> None:
        self.alpha = alpha
        self._rate = 0.0
        self._last_t: float | None = None
        self.total = 0

    def feed(self, n_samples: int) -> float:
        now = time.monotonic()
        self.total += n_samples
        if self._last_t is not None:
            dt = now - self._last_t
            if dt > 0:
                inst = n_samples / dt
                self._rate = (inst if self._rate == 0.0 else
                              self._rate + self.alpha *
                              (inst - self._rate))
        self._last_t = now
        return self._rate

    @property
    def rate(self) -> float:
        return self._rate


@dataclass
class StageStats:
    calls: int = 0
    total_s: float = 0.0

    @property
    def mean_ms(self) -> float:
        return 1e3 * self.total_s / self.calls if self.calls else 0.0


class StageTimer:
    """Accumulates wall time per named pipeline stage."""

    def __init__(self) -> None:
        self.stages: dict[str, StageStats] = defaultdict(StageStats)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            s = self.stages[name]
            s.calls += 1
            s.total_s += time.perf_counter() - t0

    def report(self) -> dict[str, dict[str, float]]:
        return {k: {"calls": v.calls, "mean_ms": v.mean_ms,
                    "total_s": v.total_s}
                for k, v in sorted(self.stages.items())}


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (TensorBoard/Perfetto format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
