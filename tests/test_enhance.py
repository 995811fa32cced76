"""Enhancement stage: base run -> frozen first pass -> refined masks train."""

import dataclasses

import numpy as np

from amss_tpu.configs.recipes import c1_stft_dpcl, enh_dpcl
from amss_tpu.data.synthetic import make_synthetic_corpus
from amss_tpu.train.engine import Trainer


def _tiny(recipe, **over):
    t = dataclasses.replace(
        recipe.train, batch_size=2, chunk_samples=2048, steps=2, valid_every=2,
        valid_steps=1, **over,
    )
    sep = dataclasses.replace(recipe.model.sep, hidden=16, layers=1, embed_dim=4)
    return dataclasses.replace(
        recipe, train=t, model=dataclasses.replace(recipe.model, sep=sep)
    )


def test_enhance_trains_on_frozen_base(tmp_path):
    store = make_synthetic_corpus(
        str(tmp_path / "c"), n_speakers=10, seconds_per_speaker=2.0
    )
    base = Trainer(_tiny(c1_stft_dpcl()), store, workdir=str(tmp_path / "runs"))
    base_state = base.fit()

    enh = Trainer(
        _tiny(enh_dpcl(base_run=base.dir)), store, workdir=str(tmp_path / "runs")
    )
    state = enh.fit()
    assert state["step"] == 2
    # base params untouched by enhancement training
    np.testing.assert_array_equal(
        np.asarray(enh.model.base_params["separator"]["proj"]["w"]),
        np.asarray(base_state["params"]["separator"]["proj"]["w"]),
    )
    # two-stage separate produces waveforms
    import jax.numpy as jnp

    mix = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2048)),
                      jnp.float32)
    est = enh.model.separate(state["params"], mix)
    assert est.shape == (1, 2, 2048)
    assert np.isfinite(np.asarray(est)).all()
