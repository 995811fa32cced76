"""Argmax pool/unpool: round-trip and first-max tie-break (TF semantics)."""

import jax.numpy as jnp
import numpy as np

from amss_tpu.ops.pooling import max_pool_argmax, unpool_argmax


def test_pool_values_match_naive(rng):
    x = rng.standard_normal((2, 16, 5)).astype(np.float32)
    vals, idx = max_pool_argmax(jnp.asarray(x), 4)
    ref = x.reshape(2, 4, 4, 5).max(axis=2)
    np.testing.assert_allclose(np.asarray(vals), ref, atol=1e-6)
    assert np.asarray(idx).dtype == np.int32


def test_tie_break_first_max():
    x = jnp.array([[[1.0], [3.0], [3.0], [0.0]]])  # [1, 4, 1], tie at slots 1,2
    _, idx = max_pool_argmax(x, 4)
    assert int(idx[0, 0, 0]) == 1


def test_unpool_roundtrip(rng):
    # Nonnegative input — matches real usage (pooling follows the |.| nonlin,
    # SURVEY.md §2.2); for negative maxima the unpooled zeros would win re-pool.
    x = np.abs(rng.standard_normal((3, 24, 8))).astype(np.float32)
    vals, idx = max_pool_argmax(jnp.asarray(x), 3)
    up = np.asarray(unpool_argmax(vals, idx, 3))
    assert up.shape == x.shape
    # Nonzero positions carry the max values; re-pooling is idempotent.
    vals2, idx2 = max_pool_argmax(jnp.asarray(up), 3)
    np.testing.assert_allclose(np.asarray(vals2), np.asarray(vals), atol=1e-6)
    # zeros elsewhere: exactly one nonzero per window per channel (unless max==0)
    nz = (up.reshape(3, 8, 3, 8) != 0).sum(axis=2)
    assert nz.max() <= 1
