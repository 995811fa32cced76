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


def test_enhancer_over_tasnet_base(tmp_path):
    """Stacking the refinement stage on a TasNet (adapt-front) base: the
    refiner must size itself from the base's front (256 codes), not the enh
    recipe's own STFT front, and train end-to-end."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amss_tpu.models.enhance import EnhancerModel
    from amss_tpu.models.tasnet import TasNetModel
    from amss_tpu.configs.recipes import c6_tasnet, enh_dpcl

    r6 = c6_tasnet()
    r6 = dataclasses.replace(
        r6,
        model=dataclasses.replace(
            r6.model,
            front=dataclasses.replace(r6.model.front, n_filters=32, filter_len=16,
                                      stride=8),
            sep=dataclasses.replace(r6.model.sep, hidden=16, blocks=1,
                                    chunk_frames=8),
        ),
    )
    base = TasNetModel(r6.model)
    base_params = base.init(jax.random.PRNGKey(0))

    re = enh_dpcl()
    re = dataclasses.replace(
        re,
        model=dataclasses.replace(
            re.model, sep=dataclasses.replace(re.model.sep, hidden=12, layers=1)
        ),
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # front mismatch warning is expected
        enh = EnhancerModel(re.model, base, base_params)
    assert enh.feature_dim == 32  # sized from the BASE front
    params = enh.init(jax.random.PRNGKey(1))
    src = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 1024)) * 0.1
    l, _ = enh.loss(params, src)
    assert np.isfinite(float(l))
    g = jax.grad(lambda p: enh.loss(p, src)[0])(params)
    assert np.abs(np.asarray(g["separator"]["proj"]["w"])).sum() >= 0
    est = enh.separate(params, jnp.sum(src, axis=1))
    assert est.shape == (2, 2, 1024)


def test_enhancer_cfg_front_matches_base_and_streams(tmp_path):
    """Regression: cfg.front must be the BASE's front after construction, so
    StreamingSeparator's frame-count math (frames_for) matches the features
    that actually flow — an STFT-vs-adapt mismatch used to raise a broadcast
    error deep inside separate()."""
    import dataclasses

    import jax
    import numpy as np

    from amss_tpu.configs.recipes import c6_tasnet, enh_dpcl
    from amss_tpu.infer.streaming import StreamingSeparator
    from amss_tpu.models.enhance import EnhancerModel
    from amss_tpu.models.tasnet import TasNetModel

    r6 = c6_tasnet()
    r6 = dataclasses.replace(
        r6,
        model=dataclasses.replace(
            r6.model,
            front=dataclasses.replace(r6.model.front, n_filters=32,
                                      filter_len=16, stride=8),
            sep=dataclasses.replace(r6.model.sep, hidden=16, blocks=1,
                                    chunk_frames=8),
        ),
    )
    base = TasNetModel(r6.model)
    base_params = base.init(jax.random.PRNGKey(0))
    re = enh_dpcl()
    re = dataclasses.replace(
        re,
        model=dataclasses.replace(
            re.model, sep=dataclasses.replace(re.model.sep, hidden=12, layers=1)
        ),
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        enh = EnhancerModel(re.model, base, base_params)
    assert enh.cfg.front == r6.model.front  # adopted, not the recipe's STFT
    params = enh.init(jax.random.PRNGKey(1))
    sep = StreamingSeparator(enh, params)
    waves = [np.random.default_rng(0).standard_normal(1500).astype(np.float32)]
    est = sep.separate_all(waves)
    assert est[0].shape == (2, 1500)


def test_enhancer_sisdr_variant_over_tasnet(tmp_path):
    """Waveform-objective refinement (loss_variant=sisdr): finite loss, grads
    reach the refiner, a few steps reduce the loss."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amss_tpu.configs.recipes import c6_tasnet, enh_dpcl
    from amss_tpu.models.enhance import EnhancerModel
    from amss_tpu.models.tasnet import TasNetModel

    r6 = c6_tasnet()
    r6 = dataclasses.replace(
        r6,
        model=dataclasses.replace(
            r6.model,
            front=dataclasses.replace(r6.model.front, n_filters=32,
                                      filter_len=16, stride=8),
            sep=dataclasses.replace(r6.model.sep, hidden=16, blocks=1,
                                    chunk_frames=8),
        ),
    )
    base = TasNetModel(r6.model)
    base_params = base.init(jax.random.PRNGKey(0))
    re = enh_dpcl()
    re = dataclasses.replace(
        re,
        model=dataclasses.replace(
            re.model, loss_variant="sisdr",
            sep=dataclasses.replace(re.model.sep, hidden=12, layers=1),
        ),
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        enh = EnhancerModel(re.model, base, base_params)
    params = enh.init(jax.random.PRNGKey(1))
    src = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 1024)) * 0.1

    def loss_fn(p):
        return enh.loss(p, src)[0]

    l0, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    assert np.abs(np.asarray(g["separator"]["proj"]["w"])).sum() > 0
    p = params
    for _ in range(8):
        p = jax.tree_util.tree_map(lambda a, b: a - 0.2 * b, p, jax.grad(loss_fn)(p))
    assert float(loss_fn(p)) < float(l0)


def test_enhancer_warns_on_waveform_trained_base():
    """Guardrail (VERDICT r2 item 8): enhancement over a waveform-trained
    TasNet base measurably regressed it in round 2 — EnhancerModel must warn
    so a user doesn't silently degrade the flagship."""
    import dataclasses

    import jax
    import pytest

    from amss_tpu.configs.recipes import c6_tasnet, enh_dpcl
    from amss_tpu.models.enhance import EnhancerModel
    from amss_tpu.models.tasnet import TasNetModel

    r6 = c6_tasnet()
    r6 = dataclasses.replace(
        r6,
        model=dataclasses.replace(
            r6.model,
            front=dataclasses.replace(r6.model.front, n_filters=32,
                                      filter_len=16, stride=8),
            sep=dataclasses.replace(r6.model.sep, hidden=16, blocks=1,
                                    repeats=1),
        ),
    )
    base = TasNetModel(r6.model)
    base_params = base.init(jax.random.PRNGKey(0))
    with pytest.warns(UserWarning, match="waveform-trained"):
        EnhancerModel(enh_dpcl().model, base, base_params)
