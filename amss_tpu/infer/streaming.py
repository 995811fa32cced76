"""Batched streaming inference: bucketed variable-length batches, fully
on-device separation, RTF accounting.

Capability parity: config 5 (BASELINE.json:11) and the reference's eval loop
(SURVEY.md §2.6 'Batch inference') — but where the reference ran one utterance
per sess.run with host k-means, here:

  * Utterances are grouped into LENGTH BUCKETS (static shapes; one compiled
    program per bucket, cached by XLA).  Bucket count is capped to bound
    recompiles (SURVEY.md §7 hard parts).
  * Each bucket batch runs mixture->masks->waveforms in ONE jit call:
    on-device k-means, mask apply, overlap-add — zero host round-trips
    (BASELINE.json:5).
  * The RTF meter reports (wall seconds of compute) / (seconds of audio), the
    north-star serving metric (<0.05 per chip, BASELINE.json:5).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BucketSpec:
    """Static bucket lengths (samples).  Defaults cover 1-16 s @ 8 kHz with
    ~1.6x spacing: 7 buckets -> at most 7 compiles per batch size."""

    lengths: tuple[int, ...] = (8192, 16384, 24576, 32768, 49152, 65536, 131072)

    def bucket_for(self, n: int) -> int:
        for l in self.lengths:
            if n <= l:
                return l
        return self.lengths[-1]


@dataclass
class RTFMeter:
    audio_seconds: float = 0.0
    compute_seconds: float = 0.0
    compile_seconds: float = 0.0  # one-time XLA compiles, excluded from rtf
    utterances: int = 0
    calls: int = 0  # dispatch+fetch round trips booked into compute_seconds

    @property
    def rtf(self) -> float:
        return self.compute_seconds / max(self.audio_seconds, 1e-9)

    def rtf_device_est(self, roundtrip_s: float) -> float:
        """RTF with the tunnel's fixed per-call round trip subtracted — the
        on-host (no-tunnel) serving estimate (bench.py measures roundtrip_s
        directly; each serving call pays one dispatch+fetch round trip)."""
        dev = self.compute_seconds - self.calls * roundtrip_s
        return max(dev, 0.0) / max(self.audio_seconds, 1e-9)

    @property
    def utterances_per_sec(self) -> float:
        return self.utterances / max(self.compute_seconds, 1e-9)


class StreamingSeparator:
    """Wraps a trained model for bucketed batch separation.

    ``model.separate`` must accept (params, mix [B,T], frame_mask [B,T']).
    """

    def __init__(self, model, params, sample_rate: int = 8000,
                 buckets: BucketSpec | None = None,
                 separate_kwargs: dict | None = None, mesh=None):
        self.model = model
        self.params = params
        self.sample_rate = sample_rate
        self.buckets = buckets or BucketSpec()
        self.kw = separate_kwargs or {}
        self.mesh = mesh  # set: over-bucket utterances go time-parallel
        # (infer/long.py::separate_long_sharded — chunk axis over the mesh)
        self._jitted: dict[tuple, callable] = {}
        self.meter = RTFMeter()

    def _frame_count(self, t: int) -> int:
        return self.model.cfg.front.frames_for(t)

    def _get_fn(self, bucket: int, batch: int):
        """Jitted per static (bucket, batch) shape; first use warms the compile
        cache on zeros so the RTF meter sees steady-state serving time only
        (compile seconds are tracked separately in meter.compile_seconds)."""
        key = (bucket, batch)
        if key not in self._jitted:
            def run(params, mix, frame_mask):
                return self.model.separate(params, mix, frame_mask=frame_mask, **self.kw)

            fn = jax.jit(run)
            t0 = time.perf_counter()
            out = fn(
                self.params,
                jnp.zeros((batch, bucket), jnp.float32),
                jnp.ones((batch, self._frame_count(bucket)), jnp.float32),
            )
            np.asarray(out[0, 0, :4])  # host fetch = real sync
            self.meter.compile_seconds += time.perf_counter() - t0
            self._jitted[key] = fn
        return self._jitted[key]

    def separate_all(self, waves: list[np.ndarray], max_batch: int = 8) -> list[np.ndarray]:
        """Separate a corpus of variable-length utterances.

        Returns per-utterance arrays [S, T_orig], in input order.  Updates
        self.meter with compute-time/audio-time accounting.  Utterances longer
        than the largest bucket take the chunked overlap-discard path
        (infer/long.py) — never truncated.
        """
        results: list[np.ndarray | None] = [None] * len(waves)

        # Over-bucket utterances: chunked long-form path, full length kept.
        max_bucket = self.buckets.lengths[-1]
        long_idx = [i for i in range(len(waves)) if len(waves[i]) > max_bucket]
        if long_idx and self.mesh is None:
            # Warm the chunked program on zeros first so first-call XLA compile
            # (minutes through the tunnel) books as compile, not serving time.
            from amss_tpu.infer.long import warm_long

            self.meter.compile_seconds += warm_long(
                self.model, self.params, chunk=max_bucket, **self.kw
            )
        for i in long_idx:
            from amss_tpu.infer.long import separate_long, separate_long_sharded

            t0 = time.perf_counter()
            if self.mesh is not None:
                results[i] = separate_long_sharded(
                    self.model, self.params, waves[i], mesh=self.mesh,
                    chunk=max_bucket, **self.kw
                )
            else:
                results[i] = separate_long(
                    self.model, self.params, waves[i], chunk=max_bucket,
                    **self.kw
                )
            self.meter.compute_seconds += time.perf_counter() - t0
            self.meter.audio_seconds += len(waves[i]) / self.sample_rate
            self.meter.utterances += 1
            self.meter.calls += 1

        bucketable = [i for i in range(len(waves)) if results[i] is None]
        order = sorted(bucketable, key=lambda i: len(waves[i]))
        groups: list[list[int]] = []
        current_bucket = None
        for i in order:
            bkt = self.buckets.bucket_for(len(waves[i]))
            if (not groups or bkt != current_bucket
                    or len(groups[-1]) >= max_batch):
                groups.append([])
            current_bucket = bkt
            groups[-1].append(i)
        groups = [g for g in groups if g]

        def pack(group):
            bucket = self.buckets.bucket_for(max(len(waves[i]) for i in group))
            b = len(group)
            mix = np.zeros((b, bucket), np.float32)
            fmask = np.zeros((b, self._frame_count(bucket)), np.float32)
            for j, i in enumerate(group):
                w = waves[i][:bucket]
                mix[j, : len(w)] = w
                fmask[j, : self._frame_count(len(w))] = 1.0
            return bucket, mix, fmask

        # Warm every distinct (bucket, batch) program BEFORE the timed phase
        # so compiles book as compile_seconds, never serving time.
        packed = [pack(g) for g in groups]
        for (bucket, mix, _), g in zip(packed, groups):
            self._get_fn(bucket, len(g))

        # Pipelined serving: dispatch ALL groups back-to-back, then fetch in
        # dispatch order.  JAX's async dispatch queues the programs on the
        # device, overlapping group k+1's host->device transfer and dispatch
        # with group k's compute — a sequential fetch-per-group loop pays
        # (round trip + transfer + compute) per group instead (measured: the
        # round-3 headline lost ~30% to exactly that serialization).
        t0 = time.perf_counter()
        pending = []
        for (bucket, mix, fmask), g in zip(packed, groups):
            fn = self._get_fn(bucket, len(g))
            pending.append(fn(self.params, jnp.asarray(mix), jnp.asarray(fmask)))
        for est, g in zip(pending, groups):
            est_np = np.asarray(est)  # host fetch = real sync (axon tunnel's
            # block_until_ready returns before remote execution completes)
            for j, i in enumerate(g):
                t_i = len(waves[i])
                results[i] = est_np[j, :, :t_i]
                self.meter.audio_seconds += t_i / self.sample_rate
                self.meter.utterances += 1
        self.meter.compute_seconds += time.perf_counter() - t0
        self.meter.calls += len(groups)
        return results  # type: ignore
