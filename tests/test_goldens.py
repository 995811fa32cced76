"""Golden losses: fixed-seed tiny models must reproduce committed values
(SURVEY.md §4).  Regenerate with scripts/gen_goldens.py after intentional
model-math changes — a diff here means the numerics changed."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def goldens():
    path = os.path.join(os.path.dirname(__file__), "goldens.json")
    if not os.path.exists(path):
        pytest.skip("goldens.json not generated yet")
    with open(path) as f:
        return json.load(f)


def _loss_for(name):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amss_tpu.configs.recipes import (
        c1_stft_dpcl,
        c2_adapt_dpcl,
        c2_pretrain_adapt,
        c3_l41,
        c4_chimera_3mix,
        c6_tasnet,
        c7_realtime,
    )
    from amss_tpu.train.engine import make_model

    def _with_sep(recipe, **kw):
        return dataclasses.replace(
            recipe,
            model=dataclasses.replace(
                recipe.model, sep=dataclasses.replace(recipe.model.sep, **kw)
            ),
        )

    recipes = {
        "c1": c1_stft_dpcl(),
        "c2_pretrain": c2_pretrain_adapt(),
        "c2": c2_adapt_dpcl(),
        "c3": c3_l41(n_train_speakers=6),
        "c4": c4_chimera_3mix(),
        "c6": c6_tasnet(),
        "c6_dpt": _with_sep(c6_tasnet(), trunk="dpt", chunk_frames=8, heads=4),
        "c7": c7_realtime(),
    }
    recipe = recipes[name]
    sep = dataclasses.replace(recipe.model.sep, hidden=16, layers=1, embed_dim=4)
    model = make_model(dataclasses.replace(recipe.model, sep=sep))
    params = model.init(jax.random.PRNGKey(7))
    rng = np.random.default_rng(1234)
    # consume draws in the same order as gen_goldens.py
    order = ["c1", "c2_pretrain", "c2", "c3", "c4", "c6", "c6_dpt", "c7"]
    loss = None
    for n in order:
        r = recipes[n]
        s = r.model.nb_speakers
        sources = jnp.asarray(rng.standard_normal((2, s, 2048)) * 0.1, jnp.float32)
        batch = {"sources": sources}
        if r.model.kind == "l41":
            batch["speaker_ids"] = jnp.asarray(rng.integers(0, 6, (2, s)), jnp.int32)
        if n == name:
            l, _ = model.loss_from_batch(params, batch)
            loss = float(l)
            break
    return loss


@pytest.mark.parametrize(
    "name", ["c1", "c2_pretrain", "c2", "c3", "c4", "c6", "c6_dpt", "c7"]
)
def test_golden(goldens, name, monkeypatch):
    monkeypatch.setenv("AMSS_PALLAS", "0")
    assert abs(_loss_for(name) - goldens[name]) <= 1e-4 * max(
        abs(goldens[name]), 1.0
    )
