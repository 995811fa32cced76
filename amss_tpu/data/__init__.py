"""Data layer: speaker store, on-the-fly mixing, bucketed batching.

Capability parity: the reference's H5PY_RW speaker store + Mixer
(SURVEY.md §2.1).  TPU-first differences:

  * Storage is memory-mapped .npy shards per speaker (no h5py dependency on
    the hot path); ingestion from WAV trees is in store.py.
  * Mixing happens ON DEVICE: the host only gathers per-speaker chunks; the
    sum (with random gains) is a fused add inside the jit train step, so
    features never round-trip (BASELINE.json:5).
  * A synthetic multi-speaker corpus generator (synthetic.py) stands in for
    WSJ0/LibriSpeech, which cannot be downloaded in this environment.
"""

from amss_tpu.data.store import SpeakerStore, ingest_wav_tree
from amss_tpu.data.mixer import Mixer
from amss_tpu.data.synthetic import make_synthetic_corpus, synth_speaker_wave
