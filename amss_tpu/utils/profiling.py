"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference had nothing beyond TensorBoard step timing; here:

  * ``trace(logdir)`` — context manager around any region; writes a
    Perfetto/TensorBoard-loadable trace via jax.profiler.
  * ``annotate(name)`` — named sub-span (shows up per-op in the trace).
  * ``step_timer`` — lightweight wall-clock step statistics (p50/p95) without
    a trace server, for RTF/chip accounting (BASELINE.json:2).
  * ``compiled_flops`` / ``mfu`` — FLOPs of a compiled program from XLA's own
    cost model, and achieved fraction of chip peak (model FLOPs utilization).
"""

from __future__ import annotations

import contextlib
import time

import jax

# Peak dense matmul throughput, TPU v5e (one chip): 197 TFLOP/s bf16/f32-acc.
# f32-only programs are measured against the same number (conservative MFU).
TPU_V5E_PEAK_FLOPS = 197e12


def compiled_flops(fn, *args, **kwargs) -> float:
    """FLOPs of ``jit(fn)(*args)`` per XLA's compiled cost analysis.

    Returns 0.0 if the backend exposes no cost model (older PJRT plugins)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returned [dict]
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", 0.0))


def mfu(flops_total: float, seconds: float, peak: float = TPU_V5E_PEAK_FLOPS) -> dict:
    """Achieved FLOP/s + fraction of chip peak for `flops_total` FLOPs done in
    `seconds` of wall time."""
    achieved = flops_total / max(seconds, 1e-12)
    return {
        "achieved_tflops": achieved / 1e12,
        "mfu_vs_v5e_peak": achieved / peak,
    }


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
