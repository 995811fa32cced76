"""Count-diverse training (model.cfg.train_min_speakers): per-sample active
speaker count drawn in-graph (front.drop_sources), trailing sources zeroed
BEFORE mixing and target construction — the training condition blind speaker
counting (infer/count.py) needs.  Beyond reference (SURVEY.md §2.3: the
reference fixes nb_speakers per experiment)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amss_tpu.models.dpcl import DPCLModel
from amss_tpu.models.front import drop_sources
from amss_tpu.utils.config import (
    FrontConfig,
    ModelConfig,
    RecipeConfig,
    SeparatorConfig,
    recipe_to_dict,
    run_id_from_stored,
)


def test_drop_sources_bounds_and_determinism():
    rng = jax.random.PRNGKey(0)
    src = jnp.ones((64, 3, 128))
    out = np.asarray(drop_sources(src, rng, 1))
    # each sample keeps a PREFIX of sources: active counts in [1, 3]
    active = (np.abs(out).sum(-1) > 0).astype(int)  # [B, S]
    counts = active.sum(-1)
    assert counts.min() >= 1 and counts.max() <= 3
    assert set(np.unique(counts)) == {1, 2, 3}  # all counts drawn at B=64
    # prefix property: no gaps (active source after a zeroed one)
    assert np.all(active == (np.arange(3)[None] < counts[:, None]))
    # kept sources pass through unscaled
    np.testing.assert_array_equal(out[active.astype(bool)], 1.0)
    # deterministic in the rng
    np.testing.assert_array_equal(
        np.asarray(drop_sources(src, rng, 1)), out
    )
    # min == S draws k = S always: identity
    np.testing.assert_array_equal(np.asarray(drop_sources(src, rng, 3)), 1.0)


def _cfg(**kw):
    return ModelConfig(
        kind="dpcl",
        front=FrontConfig(kind="stft", n_filters=64, filter_len=64, stride=32),
        sep=SeparatorConfig(hidden=24, layers=1, embed_dim=6),
        nb_speakers=3,
        **kw,
    )


def test_count_diverse_gated_on_rng():
    """rng=None (eval-style calls) must see the fixed-count path; with a
    train rng the targets change (some samples lose sources)."""
    model = DPCLModel(_cfg(train_min_speakers=1))
    fixed = DPCLModel(_cfg())
    params = model.init(jax.random.PRNGKey(0))
    src = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 3, 2048)).astype(np.float32)
    ) * 0.1
    l_no_rng, _ = model.loss(params, src)
    l_fixed, _ = fixed.loss(params, src)
    np.testing.assert_allclose(float(l_no_rng), float(l_fixed), rtol=1e-6)
    l_dropped, _ = model.loss(params, src, rng=jax.random.PRNGKey(3))
    assert abs(float(l_dropped) - float(l_fixed)) > 1e-5
    assert np.isfinite(float(l_dropped))


def test_count_diverse_chimera():
    """The other clustering kind: Chimera (DC + MI heads) trains with source
    dropout — both heads see the dropped targets consistently."""
    from amss_tpu.models.chimera import ChimeraModel

    cfg = dataclasses.replace(_cfg(train_min_speakers=1), kind="chimera")
    model = ChimeraModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    src = jnp.asarray(
        np.random.default_rng(2).standard_normal((4, 3, 2048)).astype(np.float32)
    ) * 0.1
    l_dropped, _ = model.loss(params, src, rng=jax.random.PRNGKey(5))
    l_fixed, _ = ChimeraModel(dataclasses.replace(cfg, train_min_speakers=None)
                              ).loss(params, src, rng=jax.random.PRNGKey(5))
    assert np.isfinite(float(l_dropped))
    assert abs(float(l_dropped) - float(l_fixed)) > 1e-5


def test_count_diverse_grads_finite():
    model = DPCLModel(_cfg(train_min_speakers=1))
    params = model.init(jax.random.PRNGKey(0))
    src = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 3, 2048)).astype(np.float32)
    ) * 0.1
    g = jax.grad(lambda p: model.loss(p, src, rng=jax.random.PRNGKey(7))[0])(
        params
    )
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_cli_rejects_non_clustering_kinds():
    from types import SimpleNamespace

    from amss_tpu.cli import _build_recipe

    args = SimpleNamespace(
        recipe="c6", min_speakers=1, steps=None, batch_size=None,
        chunk_samples=None, lr=None, seed=None, valid_every=None,
        data_axis=None, train_noise_snr=None, train_reverb_rt60=None,
        train_reverb_drr=None, loss_variant=None, weight_kind=None,
        vad_threshold_db=None,
    )
    with pytest.raises(SystemExit, match="clustering"):
        _build_recipe(args, store=None)


def test_count_diverse_run_id_exclusion():
    """Configs without the knob hash to their pre-growth run id."""
    cfg = RecipeConfig(model=ModelConfig())
    d = recipe_to_dict(cfg)
    pre = dict(d, model=dict(d["model"]))
    pre["model"].pop("train_min_speakers")
    assert run_id_from_stored(d) == run_id_from_stored(pre)
    on = dict(d, model=dict(d["model"], train_min_speakers=1))
    assert run_id_from_stored(on) != run_id_from_stored(d)
