"""bench.py's slope-based device timer (completion-poll cancellation).

Round-4's capture booked the axon tunnel's ~1.2 s completion-poll quantum as
device compute (625 ms/call vs the 16 ms the round-5 bisect measured for the
same program — `headline_bisect_r5` in quality_results.jsonl).  The fix times
walls at two rep counts and differences them, so any per-measurement fixed
cost (RTT, poll) cancels.  These tests pin that contract on CPU."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench_mod():
    import bench

    return bench


def test_slope_timer_finite_and_plausible(bench_mod):
    x = np.ones((128, 128), np.float32)
    ms = bench_mod._device_ms_per_call(lambda a, b: a @ b, (x, x),
                                       reps=(2, 10))
    assert np.isfinite(ms) and 0.0 <= ms < 5000.0


def test_slope_timer_cancels_fixed_cost(bench_mod):
    """A fixed per-measurement cost must not inflate the per-call estimate:
    estimates at two different rep pairs should agree to within the noise of
    a trivial program (both tiny), not differ by a fixed quantum / reps."""
    x = np.ones((64, 64), np.float32)
    f = lambda a, b: a @ b + 1.0  # noqa: E731
    lo = bench_mod._device_ms_per_call(f, (x, x), reps=(2, 10))
    hi = bench_mod._device_ms_per_call(f, (x, x), reps=(4, 20))
    assert abs(lo - hi) < 50.0  # same program, same order of magnitude
