"""WAV tree ingestion: write_wav -> ingest_wav_tree -> SpeakerStore round trip."""

import os

import numpy as np

from amss_tpu.data.store import SpeakerStore, ingest_wav_tree, _read_wav
from amss_tpu.infer.evaluate import write_wav


def test_ingest_round_trip(tmp_path, rng):
    root = tmp_path / "wavs"
    for spk in ("alice", "bob", "carol"):
        for u in range(2):
            x = (0.4 * rng.standard_normal(3000)).astype(np.float32)
            write_wav(str(root / spk / f"utt{u}.wav"), x, sample_rate=8000)

    store = ingest_wav_tree(str(root), str(tmp_path / "store"))
    assert store.speakers == ["alice", "bob", "carol"]
    assert store.sample_rate == 8000
    w = store.waveform("alice")
    assert len(w) == 6000  # two concatenated utterances
    # manifest records utterance boundaries
    bounds = store.manifest["speakers"]["alice"]["utterances"]
    assert bounds == [[0, 3000], [3000, 6000]] or bounds == [(0, 3000), (3000, 6000)]
    # reopenable
    store2 = SpeakerStore(str(tmp_path / "store"))
    np.testing.assert_array_equal(np.asarray(store2.waveform("bob")),
                                  np.asarray(store.waveform("bob")))


def test_wav_io_16bit_accuracy(tmp_path, rng):
    x = np.clip(rng.standard_normal(2000) * 0.3, -1, 1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, x, sample_rate=8000)
    y, sr = _read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)