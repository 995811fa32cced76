"""On-the-fly S-speaker mixing with speaker-disjoint splits.

Capability parity: the reference's Mixer (select_split / shuffle / get_batch —
SURVEY.md §2.1, §3.1).  TPU-first differences:

  * The host only GATHERS per-speaker source chunks; the mixture is summed on
    device inside the jit step (BASELINE.json:5 "device-side mixing").
  * Iteration is stateless-deterministic: batch ``i`` of epoch ``e`` on host
    ``h`` is a pure function of (seed, split, e, i, h), so a preempted job
    resumes exactly by replaying the step counter (SURVEY.md §5.3) — no RNG
    state to checkpoint.  (host=0 yields the identical stream to the
    pre-multi-host contract: trailing-zero SeedSequence words are stripped.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from amss_tpu.data.store import SpeakerStore

_SPLITS = ("train", "valid", "test")


def _chunk_wrap(wave: np.ndarray, start: int, t: int) -> np.ndarray:
    """Chunk of length t from `wave` starting at `start`, wrapping to the
    shard head if short — bit-identical to the native kernel's semantics."""
    if start + t <= len(wave):
        return np.asarray(wave[start : start + t], np.float32)
    out = np.empty(t, np.float32)
    pos, filled = start, 0
    while filled < t:
        take = min(len(wave) - pos, t - filled)
        out[filled : filled + take] = wave[pos : pos + take]
        filled += take
        pos = 0
    return out


@dataclass
class Batch:
    """Host-side batch; `.sources` is summed on device to form the mixture."""

    sources: np.ndarray  # [B, S, T] float32
    speaker_ids: np.ndarray  # [B, S] int32 — global speaker indices
    gains: np.ndarray  # [B, S] float32 linear gains already applied


@dataclass
class Plan:
    """Selection-only batch (device-resident corpus mode): which chunks to
    gather, without materializing audio on host.  Same determinism contract
    as Batch — plan(seed, split, step, host) draws the identical selection."""

    speaker_ids: np.ndarray  # [B, S] int32 — global speaker indices
    starts: np.ndarray  # [B, S] int32 chunk offsets into each shard
    gains: np.ndarray  # [B, S] float32 linear gains


class Mixer:
    """Sample S distinct same-split speakers, random chunks, random gains."""

    def __init__(
        self,
        store: SpeakerStore,
        nb_speakers: int = 2,
        chunk_samples: int = 32000,
        split_fractions: tuple[float, float, float] = (0.7, 0.15, 0.15),
        gain_db_range: tuple[float, float] = (-2.5, 2.5),
        seed: int = 0,
    ):
        self.store = store
        self.s = nb_speakers
        self.t = chunk_samples
        self.gain_db = gain_db_range
        self.seed = seed

        # Speaker-disjoint splits: partition the (shuffled) global speaker list.
        spk = list(store.speakers)
        rng = np.random.default_rng(seed)
        rng.shuffle(spk)
        n = len(spk)
        n_tr = max(int(n * split_fractions[0]), nb_speakers)
        n_va = max(int(n * split_fractions[1]), nb_speakers)
        if n_tr + n_va + nb_speakers > n:  # shrink train to keep splits disjoint
            n_tr = n - n_va - nb_speakers
        if n_tr < nb_speakers:
            raise ValueError(
                f"{n} speakers cannot give disjoint splits with S={nb_speakers}"
            )
        self.split_speakers = {
            "train": spk[:n_tr],
            "valid": spk[n_tr : n_tr + n_va],
            "test": spk[n_tr + n_va :],
        }
        self.global_index = {s: i for i, s in enumerate(store.speakers)}

    def n_train_speakers(self) -> int:
        return len(self.split_speakers["train"])

    def batch(
        self, split: str, step: int, batch_size: int, host: int = 0
    ) -> Batch:
        """Deterministic batch: pure function of (seed, split, step, host).

        Selection (speakers, offsets, gains) is drawn here in numpy — one
        place owns the determinism contract; the memory-bound gather+scale
        runs in the native C++ kernel when available (data/native.py), with a
        bit-identical numpy fallback.

        ``host`` decorrelates the per-process streams in multi-host DP
        (SURVEY.md §2.7: per-host Mixer shards over DCN): each process draws
        an INDEPENDENT stream for its LOCAL slice of the global batch (pass
        jax.process_index() and batch_size = global // process_count; the
        Trainer assembles the global array via
        jax.make_array_from_process_local_data).  Streams are independent,
        not partitioned — the same chunk may appear on two hosts, which is
        statistically fine for random mixing.
        """
        plan = self.plan(split, step, batch_size, host=host)
        ids, starts, gains = plan.speaker_ids, plan.starts.astype(np.int64), plan.gains
        shards = [self.store.waveform(s) for s in self.store.speakers]
        flat = np.empty((batch_size * self.s, self.t), np.float32)
        from amss_tpu.data.native import batch_fill

        if not batch_fill(flat, shards, ids.ravel(), starts.ravel(), gains.ravel()):
            for k in range(batch_size * self.s):
                flat[k] = gains.ravel()[k] * _chunk_wrap(
                    shards[ids.ravel()[k]], int(starts.ravel()[k]), self.t
                )
        return Batch(
            sources=flat.reshape(batch_size, self.s, self.t),
            speaker_ids=ids,
            gains=gains,
        )

    def plan(self, split: str, step: int, batch_size: int, host: int = 0) -> Plan:
        """Chunk-selection plan only — pure function of (seed, split, step,
        host), drawing in the exact order batch() always did, so host-gather
        and device-gather modes see identical data."""
        assert split in _SPLITS
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, _SPLITS.index(split), step, host])
        )
        speakers = self.split_speakers[split]
        ids = np.empty((batch_size, self.s), np.int32)
        starts = np.empty((batch_size, self.s), np.int32)
        lo, hi = self.gain_db
        gains_db = rng.uniform(lo, hi, size=(batch_size, self.s))
        gains = (10.0 ** (gains_db / 20.0)).astype(np.float32)
        for b in range(batch_size):
            chosen = rng.choice(len(speakers), size=self.s, replace=False)
            for j, c in enumerate(chosen):
                spk = speakers[c]
                ids[b, j] = self.global_index[spk]
                n = self.store.n_samples(spk)
                starts[b, j] = rng.integers(0, max(n - self.t, 1))
        return Plan(speaker_ids=ids, starts=starts, gains=gains)

    def epoch(
        self, split: str, steps: int, batch_size: int, epoch: int = 0, host: int = 0
    ):
        """Yield `steps` deterministic batches for this epoch (local shard of
        size ``batch_size`` when ``host``/multi-process — see batch())."""
        base = epoch * steps
        for i in range(steps):
            yield self.batch(split, base + i, batch_size, host=host)
