"""Native C++ batch assembly: availability, parity with numpy fallback."""

import numpy as np

from amss_tpu.data.native import batch_fill, native_available
from amss_tpu.data.mixer import Mixer, _chunk_wrap
from amss_tpu.data.synthetic import make_synthetic_corpus


def test_native_compiles():
    assert native_available(), "g++ toolchain present in image; should compile"


def test_native_matches_fallback(rng):
    shards = [rng.standard_normal(n).astype(np.float32) for n in (5000, 300, 1200)]
    idx = np.array([0, 1, 2, 1], np.int32)
    starts = np.array([100, 250, 1100, 0], np.int64)  # chunk 1 & 2 wrap
    gains = np.array([1.0, 0.5, 2.0, 1.5], np.float32)
    t = 400
    out = np.empty((4, t), np.float32)
    assert batch_fill(out, shards, idx, starts, gains)
    for k in range(4):
        want = gains[k] * _chunk_wrap(shards[idx[k]], int(starts[k]), t)
        np.testing.assert_allclose(out[k], want, atol=1e-7)


def test_mixer_uses_native_and_stays_deterministic(tmp_path):
    store = make_synthetic_corpus(
        str(tmp_path / "c"), n_speakers=10, seconds_per_speaker=2.0
    )
    m = Mixer(store, nb_speakers=2, chunk_samples=4000, seed=3)
    b1 = m.batch("train", 0, 4)
    b2 = m.batch("train", 0, 4)
    np.testing.assert_array_equal(b1.sources, b2.sources)
    assert np.isfinite(b1.sources).all()
