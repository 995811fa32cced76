"""Metric writer: JSONL scalars + optional TensorBoard event files.

Capability parity: the reference's TensorBoard scalar/image summaries
(SURVEY.md §5.5).  Primary sink is an append-only ``metrics.jsonl`` (greppable,
no deps); if a TensorBoard writer is importable it mirrors scalars there.
Writes are host-side and batched — never inside the jit step.
"""

from __future__ import annotations

import json
import os
import time


class MetricWriter:
    def __init__(self, directory: str):
        # Lazy: nothing touches disk until the first write, so constructing a
        # Trainer for evaluation/restore never creates empty run dirs.
        self.dir = directory
        self._f = None
        self._tb = None
        self._opened = False

    def _open(self):
        if self._opened:
            return
        self._opened = True
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        try:  # optional mirror (torch.utils.tensorboard ships in this image)
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(self.dir, "tb"))
        except Exception:
            pass

    def scalars(self, step: int, values: dict[str, float]):
        self._open()
        rec = {"step": step, "time": time.time(), **values}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, v, step)

    def image(self, step: int, tag: str, img):
        """Log a [H, W] (grayscale heatmap) or [3, H, W] image — used for
        spectrogram / mask summaries (reference parity: SURVEY.md §5.5).
        Falls back to a .npy dump when no TensorBoard writer exists."""
        import numpy as np

        arr = np.asarray(img, dtype=np.float32)
        self._open()
        if self._tb is not None:
            if arr.ndim == 2:  # min-max normalize heatmap to [0, 1]
                lo, hi = float(arr.min()), float(arr.max())
                arr = (arr - lo) / max(hi - lo, 1e-9)
                arr = arr[None]  # [1, H, W]
            self._tb.add_image(tag, arr, step)
        else:
            d = os.path.join(self.dir, "images")
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"{tag.replace('/', '_')}_{step}.npy"), arr)

    def flush(self):
        if self._f is not None:
            self._f.flush()
        if self._tb is not None:
            self._tb.flush()
