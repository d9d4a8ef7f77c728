"""Tracing / profiling utilities.

The reference has zero instrumentation (SURVEY.md §5: prints only).  This
module provides the framework's observability layer: structured per-phase
wall timing (encode / NTT / MSM / open), throughput reporting, and a thin
wrapper over ``jax.profiler`` for TensorBoard/Perfetto traces of the device
kernels.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall time per named phase; device work is fenced with
    block_until_ready when a result is passed to ``stop``."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                try:
                    block_on.block_until_ready()
                except AttributeError:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict:
        return {name: {"total_s": round(t, 4),
                       "count": self.counts[name],
                       "mean_s": round(t / self.counts[name], 4)}
                for name, t in sorted(self.totals.items())}

    def dump(self) -> str:
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 3, **kwargs):
    """(best_seconds, result) with block_until_ready fencing."""
    result = None
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        try:
            result.block_until_ready()
        except AttributeError:
            pass
        best = min(best, time.perf_counter() - t0)
    return best, result
