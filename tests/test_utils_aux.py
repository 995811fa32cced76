"""Direct unit tests for the auxiliary subsystems that the fit loop uses
implicitly: the double-buffered Prefetcher, the MetricWriter sinks, and the
numerical-safety rails (SURVEY.md §5.1/§5.2/§5.5)."""

import json
import os

import numpy as np
import pytest

from amss_tpu.data.prefetch import Prefetcher
from amss_tpu.utils.debug import check_finite, nan_guard
from amss_tpu.utils.logging import MetricWriter


def test_prefetcher_order_and_contents():
    made = []

    def make(step):
        made.append(step)
        return {"x": np.full((2,), step, np.float32)}

    def put(host):
        return {k: v + 1.0 for k, v in host.items()}  # stand-in device_put

    steps, batches = zip(*Prefetcher(make, put, start_step=3, end_step=9))
    assert list(steps) == list(range(3, 9)) == made
    for s, b in zip(steps, batches):
        np.testing.assert_array_equal(b["x"], np.full((2,), s + 1.0))


def test_prefetcher_surfaces_worker_errors():
    def make(step):
        if step == 2:
            raise RuntimeError("boom at 2")
        return step

    it = Prefetcher(make, lambda h: h, start_step=0, end_step=5)
    got = [next(it) for _ in range(2)]
    assert [s for s, _ in got] == [0, 1]
    with pytest.raises(RuntimeError, match="boom at 2"):
        for _ in it:
            pass


def test_prefetcher_empty_range():
    assert list(Prefetcher(lambda s: s, lambda h: h, 5, 5)) == []


def test_prefetcher_stall_raises_instead_of_hanging():
    """A worker stuck in a device transfer (hung tunnel call) must surface as
    a loud error in the consumer, not a silent forever-block."""
    import threading

    ev = threading.Event()

    def make(step):
        ev.wait(30.0)  # simulates a device_put that never returns
        return step

    it = Prefetcher(make, lambda h: h, 0, 3, stall_timeout=0.3)
    with pytest.raises(RuntimeError, match="tunnel stall"):
        next(it)
    ev.set()  # release the worker thread so the test process exits clean
    it.close()


def test_metric_writer_jsonl_and_lazy_dir(tmp_path):
    d = str(tmp_path / "run")
    w = MetricWriter(d)
    assert not os.path.exists(d)  # lazy: no empty run dirs from eval/restore
    w.scalars(10, {"train/loss": 0.5})
    w.scalars(20, {"train/loss": 0.25, "valid/loss": 0.3})
    w.flush()
    recs = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    assert [r["step"] for r in recs] == [10, 20]
    assert recs[1]["valid/loss"] == 0.3 and "time" in recs[0]


def test_metric_writer_image_sink(tmp_path):
    d = str(tmp_path / "run")
    w = MetricWriter(d)
    img = np.random.default_rng(0).standard_normal((6, 8)).astype(np.float32)
    w.image(5, "valid/spec", img)
    w.flush()
    # either the TB mirror wrote an event file, or the .npy fallback exists
    tb = os.path.join(d, "tb")
    npy = os.path.join(d, "images", "valid_spec_5.npy")
    assert (os.path.isdir(tb) and os.listdir(tb)) or os.path.exists(npy)


def test_check_finite():
    check_finite({"a": np.ones(3), "b": (np.zeros(2),)}, where="ok-tree")
    with pytest.raises(FloatingPointError, match="nan=1"):
        check_finite({"a": np.array([1.0, np.nan])}, where="bad")
    with pytest.raises(FloatingPointError, match="inf=2"):
        check_finite([np.array([np.inf, -np.inf])])


def test_nan_guard_catches_nan_production():
    import jax
    import jax.numpy as jnp

    with pytest.raises(FloatingPointError):
        with nan_guard():
            np.asarray(jnp.log(jnp.zeros(2) - 1.0))  # log of negative -> nan
    # and normal computation passes under the guard
    with nan_guard():
        assert float(jnp.sum(jnp.ones(4))) == 4.0


def test_prefetcher_slow_consumer_still_terminates():
    """Regression: when the worker finishes while the queue is still full
    (consumer behind), the StopIteration sentinel must not be dropped — the
    old bounded put silently lost it and the consumer blocked forever."""
    import time

    it = Prefetcher(lambda s: s, lambda h: h, 0, 2, depth=2)
    time.sleep(1.0)  # let the worker fill the queue and reach its finally
    done = []

    def consume():
        done.append(list(it))

    t = __import__("threading").Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=10.0)
    assert done and [s for s, _ in done[0]] == [0, 1], "consumer hung"
