"""Noise-robust training (model.cfg.train_noise_snr_db): in-graph mixture
corruption — SNR scaling, determinism, train-only gating, and end-to-end
training through every model family that supports it."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.configs.recipes import c1_stft_dpcl
from amss_tpu.data.synthetic import make_synthetic_corpus
from amss_tpu.models.front import corrupt_mix
from amss_tpu.models.tasnet import TasNetModel
from amss_tpu.train.engine import Trainer
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def test_corrupt_mix_snr_and_determinism():
    rng = jax.random.PRNGKey(0)
    t = 8000
    mix = jnp.sin(2 * jnp.pi * 220.0 * jnp.arange(t) / 8000.0)[None] * 0.5
    mix = jnp.broadcast_to(mix, (4, t))
    noisy = corrupt_mix(mix, rng, (10.0, 10.0))  # pinned SNR
    noise = np.asarray(noisy - mix)
    snr = 10.0 * np.log10(
        np.mean(np.asarray(mix) ** 2, axis=-1) / np.mean(noise**2, axis=-1)
    )
    np.testing.assert_allclose(snr, 10.0, atol=0.1)
    # deterministic in the rng; different rng -> different noise
    np.testing.assert_array_equal(
        np.asarray(corrupt_mix(mix, rng, (5.0, 15.0))),
        np.asarray(corrupt_mix(mix, rng, (5.0, 15.0))),
    )
    assert not np.allclose(
        np.asarray(corrupt_mix(mix, jax.random.PRNGKey(1), (10.0, 10.0))),
        np.asarray(noisy),
    )


def _noisy_cfg():
    return ModelConfig(
        kind="tasnet",
        front=FrontConfig(kind="adapt", n_filters=32, filter_len=16, stride=8, pool=1),
        sep=SeparatorConfig(hidden=24, layers=1, embed_dim=4, trunk="tcn",
                            blocks=2, repeats=1),
        nb_speakers=2,
        train_noise_snr_db=(5.0, 20.0),
    )


def test_noise_gated_on_rng():
    """rng=None (eval-style calls) must see the clean path: the loss with no
    rng equals the clean-config loss, and separate() is untouched."""
    model = TasNetModel(_noisy_cfg())
    clean = TasNetModel(dataclasses.replace(_noisy_cfg(), train_noise_snr_db=None))
    params = model.init(jax.random.PRNGKey(0))
    src = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 2, 2048)).astype(np.float32)
    ) * 0.1
    l_no_rng, _ = model.loss(params, src)
    l_clean, _ = clean.loss(params, src)
    np.testing.assert_allclose(float(l_no_rng), float(l_clean), rtol=1e-6)
    # with an rng the observed mixture is corrupted -> different loss
    l_noisy, _ = model.loss(params, src, rng=jax.random.PRNGKey(3))
    assert abs(float(l_noisy) - float(l_clean)) > 1e-4


def test_noisy_training_end_to_end(tmp_path):
    """c1 (clustering family, noise through encode_mix_and_sources) trains
    with train_noise_snr_db set; loss decreases on the noisy objective."""
    store = make_synthetic_corpus(
        str(tmp_path / "corpus"), n_speakers=10, seconds_per_speaker=2.0
    )
    r = c1_stft_dpcl()
    r = dataclasses.replace(
        r,
        train=dataclasses.replace(
            r.train, batch_size=2, chunk_samples=2048, steps=12,
            valid_every=6, valid_steps=1, lr=3e-3,
        ),
        model=dataclasses.replace(
            r.model,
            train_noise_snr_db=(5.0, 15.0),
            sep=dataclasses.replace(r.model.sep, hidden=24, layers=1, embed_dim=6),
        ),
    )
    tr = Trainer(r, store, workdir=str(tmp_path / "runs"))
    state0 = tr.init_state()
    batch = tr._dequantize(tr._device_batch(tr.mixer.batch("valid", 0, 2)))
    l0, _ = tr.model.loss_from_batch(state0["params"], batch,
                                     rng=jax.random.PRNGKey(9))
    state = tr.fit()
    l1, _ = tr.model.loss_from_batch(state["params"], batch,
                                     rng=jax.random.PRNGKey(9))
    assert float(l1) < float(l0)
