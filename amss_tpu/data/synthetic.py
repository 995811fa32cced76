"""Synthetic multi-speaker corpus (development / CI stand-in for WSJ0).

Each synthetic "speaker" has a fixed fundamental (f0) and spectral envelope;
utterances are harmonic tones with slow amplitude/f0 modulation plus breath
noise.  Distinct f0s make separation analytically verifiable (SURVEY.md §4
integration-test strategy) while still exercising the full model stack.
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 8000


def synth_speaker_wave(
    speaker_seed: int,
    n_samples: int,
    sample_rate: int = SAMPLE_RATE,
    n_harmonics: int = 8,
) -> np.ndarray:
    """One speaker's continuous 'speech': harmonic stack + AM + noise floor."""
    rng = np.random.default_rng(speaker_seed)
    f0 = 80.0 + 180.0 * rng.random()  # 80-260 Hz, distinct per speaker
    envelope = rng.random(n_harmonics) + 0.2
    envelope /= envelope.sum()

    t = np.arange(n_samples) / sample_rate
    # Slow f0 wander (vibrato-ish) and syllabic amplitude modulation.
    wander = 1.0 + 0.02 * np.sin(2 * np.pi * (0.3 + rng.random()) * t + rng.random())
    am = 0.55 + 0.45 * np.sin(2 * np.pi * (2.0 + 2.0 * rng.random()) * t + rng.random())
    phase = np.cumsum(2 * np.pi * f0 * wander / sample_rate)

    x = np.zeros(n_samples)
    for h in range(1, n_harmonics + 1):
        if h * f0 * 1.05 >= sample_rate / 2:
            break
        x += envelope[h - 1] * np.sin(h * phase + rng.random() * 2 * np.pi)
    x *= am
    x += 0.01 * rng.standard_normal(n_samples)
    x /= max(np.abs(x).max(), 1e-6)
    return (0.5 * x).astype(np.float32)


def make_synthetic_corpus(
    root: str,
    n_speakers: int = 12,
    seconds_per_speaker: float = 30.0,
    sample_rate: int = SAMPLE_RATE,
    seed: int = 0,
) -> "SpeakerStore":
    """Write a synthetic corpus into a SpeakerStore directory and open it."""
    from amss_tpu.data.store import SpeakerStore

    store = SpeakerStore.create(root, sample_rate=sample_rate)
    n = int(seconds_per_speaker * sample_rate)
    for s in range(n_speakers):
        wave = synth_speaker_wave(seed * 10_000 + s, n, sample_rate)
        store.add_speaker(f"spk{s:03d}", wave)
    store.finalize()
    return store
