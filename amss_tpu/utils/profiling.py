"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference had nothing beyond TensorBoard step timing; here:

  * ``trace(logdir)`` — context manager around any region; writes a
    Perfetto/TensorBoard-loadable trace via jax.profiler.
  * ``annotate(name)`` — named sub-span (shows up per-op in the trace).
  * ``step_timer`` — lightweight wall-clock step statistics (p50/p95) without
    a trace server, for RTF/chip accounting (BASELINE.json:2).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock stats for jitted steps (call .tick() after block_until_ready)."""

    def __init__(self):
        self.samples: list[float] = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.samples.append(now - self._last)
        self._last = now

    def stats(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p95_s": s[min(int(n * 0.95), n - 1)],
            "n": n,
        }
