"""TCN (Conv-TasNet-style) trunk: shapes, dilated depthwise conv correctness,
padding-mask exactness, receptive field, TasNet integration, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.models.tasnet import TasNetModel
from amss_tpu.models.tcn import _depthwise_dilated, init_tcn, tcn_stack
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def _params(key=0, n_in=12, b=16, h=24, blocks=3, repeats=2, kernel=3):
    return init_tcn(
        jax.random.PRNGKey(key), n_in, b, h, blocks, repeats=repeats, kernel=kernel
    )


def test_shapes():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 37, 12))
    out = tcn_stack(p, x, blocks_per_repeat=3)
    assert out.shape == (3, 37, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_depthwise_dilated_matches_naive():
    """The shift-and-add implementation equals an explicit per-channel
    correlation with symmetric zero padding, at dilation 1 and 4."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 20, 5)), jnp.float32)
    for dil in (1, 4):
        got = np.asarray(_depthwise_dilated(w, x, dil))
        xp = np.pad(np.asarray(x), ((0, 0), (dil, dil), (0, 0)))
        want = sum(
            np.asarray(w)[i] * xp[:, i * dil : i * dil + 20] for i in range(3)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_mask_exactness_vs_shorter_batch():
    """A padded row with a mask must equal the same row run unpadded —
    the bucketed-inference contract."""
    p = _params()
    t_real, t_pad = 24, 40
    x_real = jax.random.normal(jax.random.PRNGKey(2), (1, t_real, 12))
    x_padded = jnp.pad(x_real, ((0, 0), (0, t_pad - t_real), (0, 0)))
    mask = jnp.zeros((1, t_pad)).at[:, :t_real].set(1.0)
    out_real = tcn_stack(p, x_real, blocks_per_repeat=3)
    out_pad = tcn_stack(p, x_padded, mask=mask, blocks_per_repeat=3)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :t_real]), np.asarray(out_real), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out_pad[:, t_real:]), 0.0)


def test_receptive_field_grows_with_dilation():
    """An input impulse at t=0 must influence frames far beyond the kernel
    width: total one-sided reach = sum over blocks of (P//2)*dilation."""
    p = _params(blocks=3, repeats=1)  # dilations 1,2,4 -> reach 7
    x0 = jnp.zeros((1, 32, 12))
    x1 = x0.at[0, 0, :].set(1.0)
    d = np.abs(np.asarray(tcn_stack(p, x1, blocks_per_repeat=3))
               - np.asarray(tcn_stack(p, x0, blocks_per_repeat=3)))[0].sum(-1)
    assert d[7] > 0  # reached via the dilation ladder
    # cLN + PReLU are per-frame, so influence cannot exceed the conv reach
    assert np.all(d[8:] == 0)


def test_tasnet_with_tcn_trunk_trains():
    cfg = ModelConfig(
        kind="tasnet",
        front=FrontConfig(kind="adapt", n_filters=32, filter_len=16, stride=8,
                          pool=1),
        sep=SeparatorConfig(
            hidden=16, embed_dim=6, trunk="tcn", blocks=3, repeats=2,
            dropout=0.1,
        ),
        nb_speakers=2,
    )
    model = TasNetModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "tcn" in params["separator"]
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 1024)) * 0.1

    def loss_fn(p):
        return model.loss(p, src, rng=jax.random.PRNGKey(3))[0]

    l0, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    for blk in grads["separator"]["tcn"]["blocks"]:
        assert np.abs(np.asarray(blk["dw"])).sum() > 0
        assert np.abs(np.asarray(blk["pw_in"]["w"])).sum() > 0

    p = params
    for _ in range(12):
        g = jax.grad(loss_fn)(p)
        p = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, g)
    l1 = loss_fn(p)
    assert float(l1) < float(l0)

    est = model.separate(p, jnp.sum(src, axis=1))
    assert est.shape == (2, 2, 1024)


def test_eval_deterministic_train_stochastic():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 12))
    a = tcn_stack(p, x, blocks_per_repeat=3, dropout_rate=0.5, rng=None)
    b = tcn_stack(p, x, blocks_per_repeat=3, dropout_rate=0.5, rng=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = tcn_stack(
        p, x, blocks_per_repeat=3, dropout_rate=0.5, rng=jax.random.PRNGKey(7)
    )
    assert np.abs(np.asarray(c) - np.asarray(a)).max() > 1e-6
