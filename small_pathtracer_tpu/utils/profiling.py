"""Profiling helpers (SURVEY.md section 5, "Tracing / profiling").

The reference's instrumentation is one chrono wall-clock and a broken mean
path length (it accumulates the 1e20 miss sentinel —
/root/reference/src/smallpt.cpp:478,543). Here: jax.profiler traces for
xprof/tensorboard, plus a simple phase timer."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view with xprof / tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock per named phase; remembers insertion order."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = sum(self.phases.values()) or 1.0
        return "\n".join(
            f"{k:24s} {v:8.3f}s {100 * v / total:5.1f}%"
            for k, v in self.phases.items()
        )
