"""L41: centroid-logit shapes, loss sanity, enrolled AND blind separate paths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.configs.recipes import c3_l41
from amss_tpu.train.engine import make_model


def _model():
    r = c3_l41(n_train_speakers=6)
    cfg = dataclasses.replace(
        r.model, sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4)
    )
    m = make_model(cfg)
    return m, m.init(jax.random.PRNGKey(0))


def test_loss_uses_only_present_speakers(rng):
    m, params = _model()
    sources = jnp.asarray(rng.standard_normal((2, 2, 2048)) * 0.1, jnp.float32)
    ids = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    l, metrics = m.loss(params, sources, ids)
    assert np.isfinite(float(l))
    # gradient only touches the gathered centroid rows
    g = jax.grad(lambda p: m.loss(p, sources, ids)[0])(params)
    cg = np.asarray(g["separator"]["centroids"])
    assert np.abs(cg[:4]).sum() > 0
    np.testing.assert_array_equal(cg[4:], 0.0)


def test_enrolled_and_blind_separate(rng):
    m, params = _model()
    mix = jnp.asarray(rng.standard_normal((2, 2048)) * 0.1, jnp.float32)
    enrolled = m.separate(params, mix, speaker_ids=jnp.asarray([[0, 1], [2, 3]], jnp.int32))
    blind = m.separate(params, mix, kmeans_iters=3)
    assert enrolled.shape == blind.shape == (2, 2, 2048)
    assert np.isfinite(np.asarray(enrolled)).all()
    assert np.isfinite(np.asarray(blind)).all()
