"""Host->HBM double-buffered prefetch (BASELINE.json:5: "data loading, mixing,
and feature extraction streamed to HBM via device-side prefetch").

A background thread assembles Mixer batches (native C++ gather) and issues the
async ``jax.device_put`` for batch i+depth while the device executes step i —
the train loop never blocks on host data.  Mixing itself happens inside the
jit step (device add), so only raw source chunks cross PCIe.
"""

from __future__ import annotations

import queue
import threading

import jax


class Prefetcher:
    """Iterate device-resident batches with a lookahead of ``depth``."""

    def __init__(self, make_batch, put_batch, start_step: int, end_step: int,
                 depth: int = 2, stall_timeout: float = 900.0):
        """make_batch(step) -> host batch; put_batch(host) -> device batch.

        ``stall_timeout``: seconds __next__ waits before declaring the worker
        stalled.  The axon tunnel can hang a single in-flight call forever
        (NOTES_r3 "environment traps"; it ate the round-4 ema_ab stage for
        17+ min at 0% CPU) — a worker stuck inside jax.device_put never
        errors, so without a timeout the train loop blocks silently.  900 s
        is ~wide enough for any real host batch + transfer; on expiry the
        consumer gets a loud RuntimeError instead of a silent hang."""
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._closed = False
        self._stall_timeout = stall_timeout

        def worker():
            try:
                for step in range(start_step, end_step):
                    if self._closed:
                        return
                    host = make_batch(step)
                    item = (step, put_batch(host))
                    while not self._closed:  # bounded put, abortable
                        try:
                            self._q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            pass
            except Exception as e:  # surfaced on next __next__
                self._err = e
            finally:
                # The sentinel must not be dropped: a full queue here just
                # means the consumer is behind — keep retrying (abortable by
                # close()) or the consumer would block forever on get().
                while not self._closed:
                    try:
                        self._q.put(None, timeout=0.2)
                        break
                    except queue.Full:
                        pass

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self):
        """Stop the worker early (e.g. early stopping): flag, drain, join."""
        self._closed = True
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __iter__(self):
        return self

    def __next__(self):
        try:
            item = self._q.get(timeout=self._stall_timeout)
        except queue.Empty:
            raise RuntimeError(
                f"prefetch worker produced nothing for {self._stall_timeout:g}s"
                " — likely a hung device transfer (axon tunnel stall); kill"
                " and resume the run (scripts/r3_wave.py resume <run_dir>)"
            ) from None
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
