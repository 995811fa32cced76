"""Bucketed streaming inference: ordering, lengths, masks, RTF meter."""

import dataclasses

import jax
import numpy as np

from amss_tpu.configs.recipes import c1_stft_dpcl
from amss_tpu.infer.streaming import BucketSpec, StreamingSeparator
from amss_tpu.train.engine import make_model


def _model():
    r = c1_stft_dpcl()
    cfg = dataclasses.replace(
        r.model, sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4)
    )
    m = make_model(cfg)
    return m, m.init(jax.random.PRNGKey(0))


def test_bucket_selection():
    b = BucketSpec(lengths=(1000, 2000, 4000))
    assert b.bucket_for(10) == 1000
    assert b.bucket_for(1500) == 2000
    assert b.bucket_for(9999) == 4000  # clamps to largest


def test_variable_lengths_roundtrip(rng):
    model, params = _model()
    lengths = [1500, 3000, 2900, 800, 3100]
    waves = [rng.standard_normal(l).astype(np.float32) for l in lengths]
    sep = StreamingSeparator(
        model, params, buckets=BucketSpec(lengths=(2048, 4096)), separate_kwargs={"kmeans_iters": 3}
    )
    outs = sep.separate_all(waves, max_batch=3)
    assert len(outs) == len(waves)
    for l, o in zip(lengths, outs):
        assert o.shape == (2, l)
        assert np.isfinite(o).all()
    assert sep.meter.utterances == 5
    assert sep.meter.audio_seconds > 0
    assert sep.meter.compute_seconds > 0
    assert sep.meter.compile_seconds > 0  # warmups tracked separately


def test_over_bucket_utterance_not_truncated(rng):
    """Longer-than-largest-bucket input takes the chunked path, full length."""
    model, params = _model()
    waves = [
        rng.standard_normal(1500).astype(np.float32),
        rng.standard_normal(9000).astype(np.float32),  # > max bucket 4096
    ]
    sep = StreamingSeparator(
        model, params, buckets=BucketSpec(lengths=(2048, 4096)),
        separate_kwargs={"kmeans_iters": 3},
    )
    outs = sep.separate_all(waves)
    assert outs[0].shape == (2, 1500)
    assert outs[1].shape == (2, 9000)  # NOT truncated to 4096
    assert np.isfinite(outs[1]).all()
    assert sep.meter.utterances == 2
