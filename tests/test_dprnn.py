"""Dual-path recurrent trunk: shapes, padding-mask exactness, dropout,
end-to-end DPCL integration, gradient flow."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.models.dprnn import dprnn_stack, init_dprnn, dropout
from amss_tpu.models.dpcl import DPCLModel
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def _params(key=0, n_in=12, d=16, h=16, blocks=2):
    return init_dprnn(jax.random.PRNGKey(key), n_in, d, h, blocks)


def test_shapes_and_nonpadded_t():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 37, 12))  # 37 % K != 0
    out = dprnn_stack(p, x, chunk_frames=8)
    assert out.shape == (3, 37, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_exactness_vs_shorter_batch():
    """A padded row with a mask must equal the same row run unpadded —
    the bucketed-inference contract (SURVEY.md §7 variable-length)."""
    p = _params()
    t_real, t_pad = 24, 40
    x_real = jax.random.normal(jax.random.PRNGKey(2), (1, t_real, 12))
    x_padded = jnp.pad(x_real, ((0, 0), (0, t_pad - t_real), (0, 0)))
    mask = jnp.zeros((1, t_pad)).at[:, :t_real].set(1.0)
    out_real = dprnn_stack(p, x_real, chunk_frames=8)
    out_pad = dprnn_stack(p, x_padded, mask=mask, chunk_frames=8)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :t_real]), np.asarray(out_real), rtol=1e-5, atol=1e-5
    )
    # padded region exactly zero
    np.testing.assert_array_equal(np.asarray(out_pad[:, t_real:]), 0.0)


def test_dropout_identity_and_randomness():
    x = jnp.ones((2, 8, 4))
    assert (dropout(None, x, 0.5) == x).all()
    assert (dropout(jax.random.PRNGKey(0), x, 0.0) == x).all()
    y = dropout(jax.random.PRNGKey(0), x, 0.5)
    assert float(jnp.mean(y)) != 1.0 or (y == x).all() is False
    # inverted scaling: surviving entries are 1/keep
    vals = np.unique(np.asarray(y))
    assert set(np.round(vals, 4)).issubset({0.0, 2.0})


def test_dpcl_with_dprnn_trunk_trains():
    cfg = ModelConfig(
        kind="dpcl",
        front=FrontConfig(kind="stft", win=64, hop=16),
        sep=SeparatorConfig(
            hidden=16, embed_dim=6, trunk="dprnn", blocks=2, chunk_frames=8,
            dropout=0.2,
        ),
        nb_speakers=2,
    )
    model = DPCLModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "dprnn" in params["separator"]
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 1024)) * 0.1

    def loss_fn(p):
        return model.loss(p, src, rng=jax.random.PRNGKey(3))[0]

    l0, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    # gradient reaches every dprnn block (both paths)
    for blk in grads["separator"]["dprnn"]["blocks"]:
        for path in ("intra", "inter"):
            g = np.asarray(blk[path]["lstm"]["fwd"]["wx"])
            assert np.abs(g).sum() > 0

    # a few SGD steps reduce the loss
    p = params
    for _ in range(12):
        g = jax.grad(loss_fn)(p)
        p = jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, p, g)
    l1 = loss_fn(p)
    assert float(l1) < float(l0)

    # separate path (eval, no rng) runs and returns the right shape
    est = model.separate(p, jnp.sum(src, axis=1))
    assert est.shape == (2, 2, 1024)


def test_dropout_only_with_rng():
    """Same params, same input: eval path (rng=None) is deterministic even
    with dropout configured; train path (rng) perturbs activations."""
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 12))
    a = dprnn_stack(p, x, chunk_frames=8, dropout_rate=0.5, rng=None)
    b = dprnn_stack(p, x, chunk_frames=8, dropout_rate=0.5, rng=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = dprnn_stack(
        p, x, chunk_frames=8, dropout_rate=0.5, rng=jax.random.PRNGKey(7)
    )
    assert np.abs(np.asarray(c) - np.asarray(a)).max() > 1e-6
