"""Tracing/profiling (SURVEY.md §5.1): the reference only prints wall-clock
minutes/seconds; we add an opt-in jax profiler trace behind --profile_dir
while keeping the same summary-line behavior at the call sites."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def maybe_profile(profile_dir: str | None):
    """Capture a jax profiler trace (viewable in TensorBoard/Perfetto) when
    a directory is given; no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax
    with jax.profiler.trace(profile_dir):
        yield


class StepTimer:
    """Host-side per-step timing kept out of the compiled path."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self):
        if not self.times:
            return {}
        import numpy as np
        arr = np.asarray(self.times)
        return {"steps": len(arr), "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p95_s": float(np.percentile(arr, 95))}
