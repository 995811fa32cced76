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
                 depth: int = 2):
        """make_batch(step) -> host batch; put_batch(host) -> device batch."""
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for step in range(start_step, end_step):
                    host = make_batch(step)
                    self._q.put((step, put_batch(host)))
            except Exception as e:  # surfaced on next __next__
                self._err = e
            finally:
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
