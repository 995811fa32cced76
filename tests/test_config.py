"""Config: run-id determinism, dict round-trip, CLI override plumbing."""

import numpy as np

from amss_tpu.configs.recipes import c1_stft_dpcl, c3_l41
from amss_tpu.utils.config import recipe_from_dict, recipe_to_dict, run_id


def test_run_id_deterministic_and_sensitive():
    a, b = c1_stft_dpcl(), c1_stft_dpcl()
    assert run_id(a) == run_id(b)
    c = c1_stft_dpcl(steps=999)
    assert run_id(a) != run_id(c)


def test_recipe_dict_roundtrip():
    r = c3_l41(n_train_speakers=17)
    r2 = recipe_from_dict(recipe_to_dict(r))
    assert r2 == r
    assert run_id(r2) == run_id(r)


def test_cli_overrides():
    import argparse

    from amss_tpu.cli import _build_recipe

    ns = argparse.Namespace(
        recipe="c1", steps=77, batch_size=4, chunk_samples=None, lr=1e-4,
        seed=None, valid_every=None, data_axis=None, hidden=99, layers=None,
        embed_dim=None, compute_dtype="bfloat16", pretrained_front=None,
        base_run=None,
    )
    r = _build_recipe(ns, store=None)
    assert r.train.steps == 77 and r.train.batch_size == 4
    assert r.train.lr == 1e-4
    assert r.model.sep.hidden == 99
    assert r.model.sep.compute_dtype == "bfloat16"
    # untouched defaults survive
    assert r.model.sep.layers == 2


def test_bin_weights_kinds(rng):
    import jax.numpy as jnp

    from amss_tpu.models.front import bin_weights

    codes = jnp.asarray(np.abs(rng.standard_normal((2, 8, 5))), np.float32)
    v = bin_weights(codes, "vad", 40.0)
    m = bin_weights(codes, "magnitude", 40.0)
    mv = bin_weights(codes, "magvad", 40.0)
    assert set(np.unique(np.asarray(v))) <= {0.0, 1.0}
    np.testing.assert_allclose(float(jnp.mean(m)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(m * v), atol=1e-7)
