"""TasNet-style waveform-PIT separator: forward shapes, loss sanity,
overfit-one-batch, permutation invariance of the objective."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.configs.recipes import c6_tasnet
from amss_tpu.models.tasnet import TasNetModel
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def _tiny_cfg():
    return ModelConfig(
        kind="tasnet",
        front=FrontConfig(kind="adapt", n_filters=32, filter_len=16, stride=8, pool=1),
        sep=SeparatorConfig(
            hidden=24, layers=1, embed_dim=4, trunk="dprnn", blocks=2, chunk_frames=8
        ),
        nb_speakers=2,
    )


def _sources(key=0, b=2, t=2048):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    tt = jnp.arange(t) / 8000.0
    s1 = jnp.sin(2 * jnp.pi * 180.0 * tt) * (1 + 0.3 * jnp.sin(2 * jnp.pi * 4 * tt))
    s2 = jnp.sin(2 * jnp.pi * 420.0 * tt) * (1 + 0.3 * jnp.cos(2 * jnp.pi * 7 * tt))
    base = jnp.stack([s1, s2])[None] * 0.3
    noise = 0.01 * jax.random.normal(k1, (b, 2, t))
    return base + noise


def test_forward_and_loss():
    model = TasNetModel(_tiny_cfg())
    params = model.init(jax.random.PRNGKey(0))
    src = _sources()
    l, metrics = model.loss(params, src)
    assert np.isfinite(float(l))
    est = model.separate(params, jnp.sum(src, axis=1))
    assert est.shape == src.shape


def test_loss_is_permutation_invariant():
    model = TasNetModel(_tiny_cfg())
    params = model.init(jax.random.PRNGKey(0))
    src = _sources()
    l1, _ = model.loss(params, src)
    l2, _ = model.loss(params, src[:, ::-1])  # swap speakers
    # mixture identical, PIT objective identical
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_overfits_one_batch():
    """A few hundred Adam steps on one tiny batch must push PIT SI-SDR well
    above the mixture baseline — proves gradients flow front-to-back through
    encoder, trunk, mask head, and decoder."""
    import optax

    model = TasNetModel(_tiny_cfg())
    params = model.init(jax.random.PRNGKey(0))
    src = _sources(b=2)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        (l, _), g = jax.value_and_grad(lambda q: model.loss(q, src), has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    l0 = None
    for i in range(300):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = float(l)
    # loss is negative mean PIT SI-SDR (dB): demand a solid gain
    assert float(l) < l0 - 5.0, (l0, float(l))


def test_recipe_registered():
    r = c6_tasnet(steps=10)
    assert r.model.kind == "tasnet"
    assert r.model.front.pool == 1
    from amss_tpu.train.engine import make_model

    m = make_model(r.model)
    assert isinstance(m, TasNetModel)
