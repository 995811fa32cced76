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


def synth_speaker_wave_v2(
    speaker_seed: int,
    n_samples: int,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Speech-like synthetic speaker: syllabic alternation of voiced segments
    (glottal-pulse harmonic stack shaped by per-speaker formants), unvoiced
    noise bursts (speaker-colored), and silences.  Broadband and
    time-structured, so the ideal-mask ceiling is much higher than v1's
    stationary harmonic combs (~13 dB vs ~9 dB) — closer to real speech
    separability."""
    rng = np.random.default_rng(speaker_seed)
    f0 = 85.0 + 170.0 * rng.random()
    # Three formants per speaker (Hz, bandwidth factor)
    formants = np.array([
        300.0 + 500.0 * rng.random(),
        900.0 + 1200.0 * rng.random(),
        2200.0 + 1300.0 * rng.random(),
    ])
    fbw = 80.0 + 80.0 * rng.random(3)

    freqs = np.fft.rfftfreq(2048, 1.0 / sample_rate)
    envelope = np.zeros_like(freqs)
    for fc, bw in zip(formants, fbw):
        envelope += 1.0 / (1.0 + ((freqs - fc) / bw) ** 2)
    envelope += 0.01

    out = np.zeros(n_samples, np.float32)
    pos = 0
    while pos < n_samples:
        seg_len = int((0.08 + 0.22 * rng.random()) * sample_rate)
        seg_len = min(seg_len, n_samples - pos)
        kind = rng.random()
        if kind < 0.55:  # voiced: harmonic stack under the formant envelope
            tloc = np.arange(seg_len) / sample_rate
            wander = f0 * (1.0 + 0.03 * np.sin(2 * np.pi * 3.0 * tloc + rng.random()))
            phase = np.cumsum(2 * np.pi * wander / sample_rate)
            seg = np.zeros(seg_len)
            h = 1
            while h * f0 < 0.45 * sample_rate and h <= 40:
                gain = np.interp(h * f0, freqs, envelope)
                seg += gain * np.sin(h * phase + 2 * np.pi * rng.random())
                h += 1
        elif kind < 0.8:  # unvoiced: formant-colored noise burst
            spec = np.fft.rfft(rng.standard_normal(seg_len))
            f_loc = np.fft.rfftfreq(seg_len, 1.0 / sample_rate)
            seg = np.fft.irfft(spec * np.interp(f_loc, freqs, envelope), seg_len)
            seg *= 0.7
        else:  # silence (with tiny breath noise)
            seg = 0.003 * rng.standard_normal(seg_len)
        # attack/decay ramps to avoid clicks
        ramp = min(160, seg_len // 4)
        if ramp > 0:
            seg[:ramp] *= np.linspace(0, 1, ramp)
            seg[-ramp:] *= np.linspace(1, 0, ramp)
        out[pos : pos + seg_len] = seg
        pos += seg_len
    out /= max(np.abs(out).max(), 1e-6)
    return (0.5 * out).astype(np.float32)


def make_synthetic_corpus(
    root: str,
    n_speakers: int = 12,
    seconds_per_speaker: float = 30.0,
    sample_rate: int = SAMPLE_RATE,
    seed: int = 0,
    version: int = 1,
) -> "SpeakerStore":
    """Write a synthetic corpus into a SpeakerStore directory and open it.

    version=1: stationary harmonic combs (fast, fully deterministic tests).
    version=2: speech-like syllabic structure (higher separation ceiling)."""
    from amss_tpu.data.store import SpeakerStore

    gen = synth_speaker_wave if version == 1 else synth_speaker_wave_v2
    store = SpeakerStore.create(root, sample_rate=sample_rate)
    n = int(seconds_per_speaker * sample_rate)
    for s in range(n_speakers):
        wave = gen(seed * 10_000 + s, n, sample_rate)
        store.add_speaker(f"spk{s:03d}", wave)
    store.finalize()
    return store
