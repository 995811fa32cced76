"""Chunked long-utterance separation: O(chunk) memory, speaker-stitched."""

import dataclasses

import jax
import numpy as np

from amss_tpu.configs.recipes import c1_stft_dpcl
from amss_tpu.infer.long import separate_long
from amss_tpu.train.engine import make_model


def _tiny_model():
    r = c1_stft_dpcl()
    cfg = dataclasses.replace(
        r.model, sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4)
    )
    model = make_model(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def test_long_matches_length_and_is_finite(rng):
    model, params = _tiny_model()
    t = 20000  # forces 3 chunks at chunk=8192, overlap=1024
    mix = rng.standard_normal(t).astype(np.float32)
    est = separate_long(model, params, mix, chunk=8192, overlap=1024)
    assert est.shape == (2, t)
    assert np.isfinite(est).all()


def test_short_input_single_pass(rng):
    model, params = _tiny_model()
    mix = rng.standard_normal(4096).astype(np.float32)
    est = separate_long(model, params, mix, chunk=8192, overlap=1024)
    assert est.shape == (2, 4096)
