"""Wall-clock instrumentation (reference src/pyutils.py:20-83 semantics:
throughput counters + ETA), plus jax.profiler hooks for real tracing —
the reference installs torch-tb-profiler but never wires it in (SURVEY §5).
"""

from __future__ import annotations

import contextlib
import time


class AverageMeter:
    def __init__(self, *names: str):
        self.totals = {n: 0.0 for n in names} if names else {}
        self.counts = {n: 0 for n in names} if names else {}

    def add(self, **kwargs: float) -> None:
        for k, v in kwargs.items():
            self.totals[k] = self.totals.get(k, 0.0) + float(v)
            self.counts[k] = self.counts.get(k, 0) + 1

    def get(self, *names: str):
        vals = tuple(self.totals[n] / max(self.counts[n], 1) for n in names)
        return vals[0] if len(vals) == 1 else vals

    def pop(self, *names: str):
        vals = self.get(*names)
        for n in names:
            self.totals[n] = 0.0
            self.counts[n] = 0
        return vals


class Timer:
    """Progress timer with ETA (reference pyutils.Timer)."""

    def __init__(self):
        self.start = time.time()
        self.stage_start = self.start
        self.progress = 0.0

    def update_progress(self, progress: float) -> None:
        self.progress = max(progress, 1e-9)

    def elapsed(self) -> float:
        return time.time() - self.start

    def stage_elapsed(self) -> float:
        return time.time() - self.stage_start

    def reset_stage(self) -> None:
        self.stage_start = time.time()

    def eta_str(self) -> str:
        remain = self.elapsed() * (1.0 - self.progress) / self.progress
        return time.strftime("%H:%M:%S", time.gmtime(self.start + self.elapsed() + remain))


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
