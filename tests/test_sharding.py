"""Distributed-without-cluster: 8 virtual CPU devices emulate the mesh
(SURVEY.md §4).  Asserts the sharded train step runs and matches 1-device
loss (data-parallel exactness)."""

import dataclasses

import jax
import numpy as np
import pytest

from amss_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def _tiny_recipe(n_dev):
    from amss_tpu.configs.recipes import c1_stft_dpcl

    r = c1_stft_dpcl()
    return dataclasses.replace(
        r,
        train=dataclasses.replace(
            r.train,
            batch_size=8,
            chunk_samples=2048,
            steps=1,
            valid_every=1,
            valid_steps=1,
            data_axis=n_dev,
        ),
        model=dataclasses.replace(
            r.model,
            sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4),
        ),
    )


@pytest.mark.parametrize("n_dev", [1, 8])
def test_sharded_loss_matches(tmp_path, n_dev, _loss_cache={}):
    """Same batch, same params → identical loss on 1-dev and 8-dev meshes."""
    import jax.numpy as jnp

    from amss_tpu.data.synthetic import make_synthetic_corpus
    from amss_tpu.train.engine import make_model

    recipe = _tiny_recipe(n_dev)
    model = make_model(recipe.model)
    params = model.init(jax.random.PRNGKey(0))
    rngv = np.random.default_rng(0)
    sources = jnp.asarray(rngv.standard_normal((8, 2, 2048)), jnp.float32)

    mesh = make_mesh(n_dev)
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    def loss(p, s):
        return model.loss_from_batch(p, {"sources": s})[0]

    fn = jax.jit(loss, in_shardings=(rep, data), out_shardings=rep)
    p = jax.device_put(params, rep)
    s = jax.device_put(sources, data)
    val = float(fn(p, s))
    _loss_cache[n_dev] = val
    if 1 in _loss_cache and 8 in _loss_cache:
        np.testing.assert_allclose(_loss_cache[1], _loss_cache[8], rtol=1e-5)


def test_dryrun_multichip_entry():
    """The driver's multichip dry run must work with 8 virtual devices."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
