"""(Re)generate tests/goldens.json: fixed-seed tiny-model losses per config
(SURVEY.md §4 golden/parity tests).  CPU float32 — exact across runs on the
same platform; tests compare with tight rtol."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["AMSS_PALLAS"] = "0"


import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def tiny_model(recipe):
    sep = dataclasses.replace(recipe.model.sep, hidden=16, layers=1, embed_dim=4)
    return dataclasses.replace(recipe.model, sep=sep)


def _with_sep(recipe, **kw):
    return dataclasses.replace(
        recipe,
        model=dataclasses.replace(
            recipe.model, sep=dataclasses.replace(recipe.model.sep, **kw)
        ),
    )


def main():
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

    rng = np.random.default_rng(1234)
    out = {}
    for name, recipe in [
        ("c1", c1_stft_dpcl()),
        ("c2_pretrain", c2_pretrain_adapt()),
        ("c2", c2_adapt_dpcl()),
        ("c3", c3_l41(n_train_speakers=6)),
        ("c4", c4_chimera_3mix()),
        ("c6", c6_tasnet()),
        # appended round 3 (order matters: each entry consumes rng draws)
        ("c6_dpt", _with_sep(c6_tasnet(), trunk="dpt", chunk_frames=8,
                             heads=4)),
        ("c7", c7_realtime()),
    ]:
        model = make_model(tiny_model(recipe))
        params = model.init(jax.random.PRNGKey(7))
        s = recipe.model.nb_speakers
        sources = jnp.asarray(rng.standard_normal((2, s, 2048)) * 0.1, jnp.float32)
        batch = {"sources": sources}
        if recipe.model.kind == "l41":
            batch["speaker_ids"] = jnp.asarray(
                rng.integers(0, 6, (2, s)), jnp.int32
            )
        loss, _ = model.loss_from_batch(params, batch)
        out[name] = float(loss)
        print(name, float(loss))

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "goldens.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
