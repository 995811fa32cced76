"""Adaptive filterbank front: shape contract, decode adjointness, trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.models.adapt import AdaptFrontEnd, AdaptAutoencoder
from amss_tpu.utils.config import FrontConfig, ModelConfig


def _front():
    return AdaptFrontEnd(
        FrontConfig(kind="adapt", n_filters=32, filter_len=64, stride=16, pool=2)
    )


def test_encode_decode_shapes(rng):
    fe = _front()
    params = fe.init(jax.random.PRNGKey(0))
    wave = jnp.asarray(rng.standard_normal((2, 1024)), jnp.float32)
    codes, aux = fe.encode(params, wave)
    assert codes.shape[0] == 2 and codes.shape[-1] == 32
    assert aux["idx"].dtype == jnp.int32
    out = fe.decode(params, codes, aux, length=1024)
    assert out.shape == (2, 1024)


def test_features_finite(rng):
    fe = _front()
    params = fe.init(jax.random.PRNGKey(0))
    wave = jnp.asarray(rng.standard_normal((1, 512)), jnp.float32)
    codes, _ = fe.encode(params, wave)
    feats = fe.features(params, codes)
    assert np.isfinite(np.asarray(feats)).all()


def test_autoencoder_loss_decreases(rng):
    cfg = ModelConfig(
        kind="adapt_ae",
        front=FrontConfig(kind="adapt", n_filters=32, filter_len=64, stride=16, pool=2),
    )
    ae = AdaptAutoencoder(cfg)
    params = ae.init(jax.random.PRNGKey(0))
    t = np.linspace(0, 1, 2048, dtype=np.float32)
    wave = np.stack(
        [np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 330 * t)]
    )[None].astype(np.float32)
    sources = jnp.asarray(wave)  # [1, 2, T]

    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (l, m), g = jax.value_and_grad(ae.loss, has_aux=True)(params, sources)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, l

    params, opt, l0 = step(params, opt)
    for _ in range(30):
        params, opt, l = step(params, opt)
    assert float(l) < float(l0)


def test_channel_norm():
    """Per-filter normalization: each channel independently zero-mean/unit-var
    over time; padding-aware."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amss_tpu.models.front import channel_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 8)) * jnp.arange(1, 9)
    y = channel_norm(x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=-2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.var(y, axis=-2)), 1.0, atol=1e-3)
    # padding-aware: masked stats over the valid prefix only
    mask = jnp.zeros((2, 40)).at[:, :25].set(1.0)
    y2 = channel_norm(x, mask)
    valid = np.asarray(y2[:, :25])
    np.testing.assert_allclose(valid.mean(axis=-2), 0.0, atol=1e-5)
    y2_ref = channel_norm(x[:, :25])
    np.testing.assert_allclose(valid, np.asarray(y2_ref), atol=1e-5)
