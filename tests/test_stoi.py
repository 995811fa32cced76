"""First-party STOI (ops/stoi.py): analytic/sanity contracts — identity
scores ~1, monotone degradation in SNR, silence invariance, error paths."""

import numpy as np
import pytest

from amss_tpu.data.synthetic import synth_speaker_wave_v2
from amss_tpu.ops.stoi import stoi


def _speech(seed=0, seconds=3.0, sr=8000):
    return np.asarray(
        synth_speaker_wave_v2(seed, n_samples=int(seconds * sr)), np.float32
    )


def test_identity_is_near_one():
    x = _speech()
    assert stoi(x, x, 8000) > 0.99


def test_gain_invariance():
    """STOI correlates band envelopes per segment with energy normalization —
    a pure gain must not change the score."""
    x = _speech(1)
    assert abs(stoi(x, 0.25 * x, 8000) - stoi(x, x, 8000)) < 1e-6


def test_monotone_in_snr():
    x = _speech(2)
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise)

    def at_snr(snr_db):
        return stoi(x, x + noise * 10.0 ** (-snr_db / 20.0), 8000)

    s20, s5, sm5 = at_snr(20.0), at_snr(5.0), at_snr(-5.0)
    assert s20 > s5 > sm5
    assert s20 > 0.85 and sm5 < 0.75


def test_silent_frame_removal():
    """Leading/trailing silence (beyond the 40 dB dynamic range) must not
    move the score: those frames are excluded before correlation."""
    x = _speech(3)
    pad = np.zeros(4000, np.float32)
    xp = np.concatenate([pad, x, pad])
    rng = np.random.default_rng(1)
    noise = (rng.standard_normal(x.shape) * 0.05).astype(np.float32)
    y = x + noise
    yp = np.concatenate([pad, y, pad])
    assert abs(stoi(xp, yp, 8000) - stoi(x, y, 8000)) < 0.02


def test_error_paths():
    x = _speech(4)
    with pytest.raises(ValueError, match="shape mismatch"):
        stoi(x, x[:-1], 8000)
    with pytest.raises(ValueError, match="at least"):
        stoi(x[:1000], x[:1000], 8000)


def test_stoi_in_evaluation():
    """evaluate_separation(with_stoi=True) reports stoi / stoi_mix / stoi_i,
    and the separated estimate scores above the mixture."""
    from amss_tpu.infer.evaluate import evaluate_separation

    a, b = _speech(10), _speech(11)
    ref = np.stack([[a, b]])
    mix = (a + b)[None]
    est = ref + 0.005 * np.random.default_rng(2).standard_normal(ref.shape)
    out = evaluate_separation(est.astype(np.float32), ref, mix, bss=False,
                              with_stoi=True)
    assert 0.9 < out["stoi"] <= 1.0
    assert out["stoi_i"] > 0.05  # clean-ish estimates beat the mixture
