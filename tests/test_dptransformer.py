"""Dual-path transformer trunk (SepFormer-style, sep.trunk='dpt'): shapes,
padding-mask exactness, attention masking, end-to-end DPCL integration,
gradient flow.  Mirrors tests/test_dprnn.py (same trunk contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.models.dpcl import DPCLModel
from amss_tpu.models.dptransformer import dpt_stack, init_dpt
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def _params(key=0, n_in=12, d=16, ffn=32, blocks=2):
    return init_dpt(jax.random.PRNGKey(key), n_in, d, ffn, blocks)


def test_shapes_and_nonpadded_t():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 37, 12))  # 37 % K != 0
    out = dpt_stack(p, x, chunk_frames=8, heads=4)
    assert out.shape == (3, 37, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_exactness_vs_shorter_batch():
    """A padded row with a mask must equal the same row run unpadded — the
    bucketed-inference contract.  Harder for attention than for scans: the
    padded frames must receive exactly zero softmax mass AND the inter-chunk
    positional encoding must not shift valid positions."""
    p = _params()
    t_real, t_pad = 24, 40
    x_real = jax.random.normal(jax.random.PRNGKey(2), (1, t_real, 12))
    x_padded = jnp.pad(x_real, ((0, 0), (0, t_pad - t_real), (0, 0)))
    mask = jnp.zeros((1, t_pad)).at[:, :t_real].set(1.0)
    out_real = dpt_stack(p, x_real, chunk_frames=8, heads=4)
    out_pad = dpt_stack(p, x_padded, mask=mask, chunk_frames=8, heads=4)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :t_real]), np.asarray(out_real),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(out_pad[:, t_real:]), 0.0)


def test_fully_masked_chunk_is_finite():
    """An all-padded chunk makes every intra-attention key masked; the
    softmax must stay finite (uniform over -1e9 logits), and the block's
    final mask multiply zeroes those rows."""
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 12))
    mask = jnp.zeros((2, 32)).at[:, :8].set(1.0)  # chunks 1..3 fully padded
    out = dpt_stack(p, x, mask=mask, chunk_frames=8, heads=4)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out[:, 8:]), 0.0)


def test_dpcl_with_dpt_trunk_trains():
    cfg = ModelConfig(
        kind="dpcl",
        front=FrontConfig(kind="stft", win=64, hop=16),
        sep=SeparatorConfig(
            hidden=16, embed_dim=6, trunk="dpt", blocks=2, chunk_frames=8,
            heads=4, dropout=0.2,
        ),
        nb_speakers=2,
    )
    model = DPCLModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "dpt" in params["separator"]
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 1024)) * 0.1

    def loss_fn(p):
        return model.loss(p, src, rng=jax.random.PRNGKey(3))[0]

    l0, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    # gradient reaches every block (attention and FFN of both paths)
    for blk in grads["separator"]["dpt"]["blocks"]:
        for path in ("intra", "inter"):
            for leaf in (blk[path]["attn"]["wq"]["w"], blk[path]["ffn"]["w1"]["w"]):
                assert np.abs(np.asarray(leaf)).sum() > 0

    p = params
    for _ in range(12):
        g = jax.grad(loss_fn)(p)
        p = jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, p, g)
    assert float(loss_fn(p)) < float(l0)

    est = model.separate(p, jnp.sum(src, axis=1))
    assert est.shape == (2, 2, 1024)


def test_heads_must_divide_hidden():
    cfg = ModelConfig(
        kind="dpcl",
        front=FrontConfig(kind="stft", win=64, hop=16),
        sep=SeparatorConfig(hidden=18, trunk="dpt", heads=4),
    )
    model = DPCLModel(cfg)
    try:
        model.init(jax.random.PRNGKey(0))
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for hidden % heads != 0")


def test_eval_deterministic_train_dropout_perturbs():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 12))
    a = dpt_stack(p, x, chunk_frames=8, heads=4, dropout_rate=0.5, rng=None)
    b = dpt_stack(p, x, chunk_frames=8, heads=4, dropout_rate=0.5, rng=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = dpt_stack(p, x, chunk_frames=8, heads=4, dropout_rate=0.5,
                  rng=jax.random.PRNGKey(7))
    assert np.abs(np.asarray(c) - np.asarray(a)).max() > 1e-6
