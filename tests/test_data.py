"""Data layer: store round-trip, mixer determinism + speaker-disjoint splits."""

import numpy as np

from amss_tpu.data.mixer import Mixer
from amss_tpu.data.store import SpeakerStore
from amss_tpu.data.synthetic import make_synthetic_corpus


def _store(tmp_path):
    return make_synthetic_corpus(
        str(tmp_path / "corpus"), n_speakers=10, seconds_per_speaker=2.0
    )


def test_store_roundtrip(tmp_path):
    store = _store(tmp_path)
    reopened = SpeakerStore(str(tmp_path / "corpus"))
    assert reopened.speakers == store.speakers
    w = reopened.waveform("spk000")
    assert w.dtype == np.float32 and len(w) == 16000


def test_mixer_deterministic(tmp_path):
    store = _store(tmp_path)
    m1 = Mixer(store, nb_speakers=2, chunk_samples=4000, seed=7)
    m2 = Mixer(store, nb_speakers=2, chunk_samples=4000, seed=7)
    b1 = m1.batch("train", 42, 4)
    b2 = m2.batch("train", 42, 4)
    np.testing.assert_array_equal(b1.sources, b2.sources)
    np.testing.assert_array_equal(b1.speaker_ids, b2.speaker_ids)
    # different step → different batch
    b3 = m1.batch("train", 43, 4)
    assert not np.array_equal(b1.sources, b3.sources)


def test_v2_corpus_speechlike(tmp_path, rng):
    """v2 generator: normalized, non-stationary (has silences), broadband."""
    from amss_tpu.data.synthetic import synth_speaker_wave_v2

    w = synth_speaker_wave_v2(5, 16000)
    assert w.dtype == np.float32 and np.abs(w).max() <= 0.5 + 1e-6
    # syllabic: frame energies span a wide dynamic range
    fe = (w[: 16000 - 16000 % 400].reshape(-1, 400) ** 2).sum(1)
    assert fe.max() > 100 * max(fe.min(), 1e-9)
    # deterministic per seed
    np.testing.assert_array_equal(w, synth_speaker_wave_v2(5, 16000))


def test_splits_disjoint_and_distinct_speakers(tmp_path):
    store = _store(tmp_path)
    m = Mixer(store, nb_speakers=2, chunk_samples=4000)
    sets = {k: set(v) for k, v in m.split_speakers.items()}
    assert not (sets["train"] & sets["valid"])
    assert not (sets["train"] & sets["test"])
    assert not (sets["valid"] & sets["test"])
    b = m.batch("train", 0, 8)
    assert all(b.speaker_ids[i, 0] != b.speaker_ids[i, 1] for i in range(8))
    # train batches only use train speakers
    train_idx = {m.global_index[s] for s in m.split_speakers["train"]}
    assert set(b.speaker_ids.ravel()) <= train_idx
