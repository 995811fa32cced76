"""Reverb-robust training (model.cfg.train_reverb_rt60): per-source synthetic
RIR convolution — causality, DRR scaling, determinism, train-only gating, and
loss paths through clustering and waveform model families."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.models.dpcl import DPCLModel
from amss_tpu.models.front import reverberate_sources
from amss_tpu.models.tasnet import TasNetModel
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def _impulses(b=2, s=2, t=4096, at=1000):
    x = np.zeros((b, s, t), np.float32)
    x[:, :, at] = 1.0
    return jnp.asarray(x)


def test_reverb_causal_and_direct_path():
    rng = jax.random.PRNGKey(0)
    at = 1000
    x = _impulses(at=at)
    y = np.asarray(reverberate_sources(x, rng, (400.0, 1600.0)))
    # causal: nothing before the impulse
    assert np.all(y[:, :, :at] == 0.0)
    # direct path present and dominant at the impulse instant
    assert np.all(y[:, :, at] > 0.5)
    # a reverb tail exists after the impulse
    assert np.all(np.sum(y[:, :, at + 1 :] ** 2, axis=-1) > 1e-4)


def test_reverb_drr_scaling():
    rng = jax.random.PRNGKey(1)
    x = _impulses(at=0)
    for drr_db in (0.0, 10.0):
        y = np.asarray(
            reverberate_sources(x, rng, (800.0, 800.0), (drr_db, drr_db))
        )
        direct = y[:, :, 0] ** 2
        tail = np.sum(y[:, :, 1:] ** 2, axis=-1)
        measured = 10.0 * np.log10(direct / tail)
        np.testing.assert_allclose(measured, drr_db, atol=0.2)
        # unit-energy RIR: an impulse keeps unit total energy
        np.testing.assert_allclose(direct + tail, 1.0, atol=1e-4)


def test_reverb_determinism_and_per_source_rirs():
    rng = jax.random.PRNGKey(2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 4096)).astype(np.float32))
    y1 = np.asarray(reverberate_sources(x, rng, (400.0, 1600.0)))
    y2 = np.asarray(reverberate_sources(x, rng, (400.0, 1600.0)))
    np.testing.assert_array_equal(y1, y2)
    y3 = np.asarray(reverberate_sources(x, jax.random.PRNGKey(3), (400.0, 1600.0)))
    assert not np.allclose(y1, y3)
    # identical dry sources get DIFFERENT rooms (per-(b,s) RIR draws)
    same = jnp.broadcast_to(x[:1, :1], x.shape)
    ys = np.asarray(reverberate_sources(same, rng, (400.0, 1600.0)))
    assert not np.allclose(ys[0, 0], ys[0, 1])
    assert not np.allclose(ys[0, 0], ys[1, 0])


def _cfg(kind, **kw):
    return ModelConfig(
        kind=kind,
        front=FrontConfig(kind="stft", win=128, hop=32)
        if kind == "dpcl"
        else FrontConfig(kind="adapt", n_filters=32, filter_len=32, stride=16,
                         pool=2, smooth_len=2),
        sep=SeparatorConfig(hidden=32, layers=1, embed_dim=8,
                            trunk="tcn", blocks=2, repeats=1),
        nb_speakers=2,
        train_reverb_rt60=(400, 1600),
        **kw,
    )


def test_reverb_loss_paths_train_only():
    key = jax.random.PRNGKey(0)
    srcs = jax.random.normal(key, (2, 2, 2048)) * 0.1
    for kind, cls in (("dpcl", DPCLModel), ("tasnet", TasNetModel)):
        model = cls(_cfg(kind))
        params = model.init(jax.random.PRNGKey(1))
        l_train, _ = model.loss(params, srcs, rng=jax.random.PRNGKey(2))
        assert np.isfinite(float(l_train))
        # rng=None (eval/deterministic): reverb must be OFF -> same loss as
        # a clean-config model
        import dataclasses

        clean = cls(dataclasses.replace(model.cfg, train_reverb_rt60=None))
        l_eval, _ = model.loss(params, srcs, rng=None)
        l_clean, _ = clean.loss(params, srcs, rng=None)
        np.testing.assert_allclose(float(l_eval), float(l_clean), rtol=1e-6)


def test_reverb_run_id_exclusion():
    """Configs without reverb hash to their pre-growth run id."""
    from amss_tpu.utils.config import RecipeConfig, recipe_to_dict, run_id_from_stored

    cfg = RecipeConfig(model=ModelConfig())
    d = recipe_to_dict(cfg)
    pre = dict(d, model=dict(d["model"]))
    pre["model"].pop("train_reverb_rt60")
    pre["model"].pop("train_reverb_drr_db")
    assert run_id_from_stored(d) == run_id_from_stored(pre)
    # and setting reverb DOES move the id
    on = dict(d, model=dict(d["model"], train_reverb_rt60=(800, 3200)))
    assert run_id_from_stored(on) != run_id_from_stored(d)
