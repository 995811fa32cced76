"""Windowed-sinc resampler + rate-converting ingest."""

import os
import wave as wave_mod

import numpy as np

from amss_tpu.data.resample import resample_sinc
from amss_tpu.data.store import ingest_wav_tree


def _sine(freq, sr, seconds=1.0, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def test_downsample_sine_matches_analytic():
    """16 kHz 440 Hz sine -> 8 kHz must equal the directly-synthesized 8 kHz
    sine in the interior (edges see the filter ramp)."""
    x16 = _sine(440.0, 16000)
    y = resample_sinc(x16, 16000, 8000)
    ref = _sine(440.0, 8000)
    assert abs(len(y) - len(ref)) <= 1
    n = min(len(y), len(ref))
    cut = 400  # skip filter edges
    np.testing.assert_allclose(y[cut : n - cut], ref[cut : n - cut], atol=2e-3)


def test_upsample_then_downsample_is_identity():
    rng = np.random.default_rng(0)
    # band-limit the test signal well under 4 kHz so the round trip is exact
    x = np.zeros(8000)
    for f in (200, 950, 1800, 3200):
        x += rng.normal() * _sine(f, 8000, 1.0, 1.0)
    up = resample_sinc(x, 8000, 16000)
    back = resample_sinc(up, 16000, 8000)
    cut = 500
    np.testing.assert_allclose(back[cut:-cut], x[cut:-cut], atol=5e-3)


def test_nontrivial_ratio():
    """44.1 kHz -> 8 kHz (up=80/down=441): tone frequency preserved."""
    x = _sine(1000.0, 44100, 0.5)
    y = resample_sinc(x, 44100, 8000)
    assert abs(len(y) - 4000) <= 1
    spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(len(y) - 400)))
    freqs = np.fft.rfftfreq(len(y) - 400, 1.0 / 8000)
    assert abs(freqs[np.argmax(spec)] - 1000.0) < 10.0


def test_aliasing_rejected():
    """A 6 kHz tone at 16 kHz is above the 8 kHz-Nyquist: after downsampling
    its energy must be strongly attenuated, not folded to 2 kHz."""
    x = _sine(6000.0, 16000)
    y = resample_sinc(x, 16000, 8000)
    rms_in = np.sqrt(np.mean(x**2))
    rms_out = np.sqrt(np.mean(y[400:-400] ** 2))
    assert rms_out < 0.01 * rms_in  # > 40 dB rejection


def _write_wav(path, x, sr):
    pcm = np.round(np.clip(x, -1, 1) * 32767).astype(np.int16)
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_ingest_resamples_16k_tree_to_8k(tmp_path):
    wavroot = tmp_path / "wavs"
    for spk, freq in [("spkA", 300.0), ("spkB", 700.0)]:
        os.makedirs(wavroot / spk)
        _write_wav(str(wavroot / spk / "utt0.wav"), _sine(freq, 16000, 2.0), 16000)
    store = ingest_wav_tree(str(wavroot), str(tmp_path / "store"), sample_rate=8000)
    assert store.sample_rate == 8000
    w = np.asarray(store.waveform("spkA"))
    assert abs(len(w) - 16000) <= 1  # 2 s at 8 kHz
    # spectral sanity: the 300 Hz tone survives at the right bin
    spec = np.abs(np.fft.rfft(w[400:-400] * np.hanning(len(w) - 800)))
    freqs = np.fft.rfftfreq(len(w) - 800, 1.0 / 8000)
    assert abs(freqs[np.argmax(spec)] - 300.0) < 5.0


def test_ingest_mixed_rates_unify(tmp_path):
    wavroot = tmp_path / "wavs"
    os.makedirs(wavroot / "spkA")
    _write_wav(str(wavroot / "spkA" / "a.wav"), _sine(400.0, 8000, 1.0), 8000)
    _write_wav(str(wavroot / "spkA" / "b.wav"), _sine(400.0, 16000, 1.0), 16000)
    store = ingest_wav_tree(str(wavroot), str(tmp_path / "store"))
    assert store.sample_rate == 8000  # adopted from the first file
    # both utterances are ~1 s at 8 kHz now
    assert abs(store.n_samples("spkA") - 16000) <= 2
