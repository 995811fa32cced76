"""DPCL expanded-gram loss == naive O((T'F)^2) affinity loss on tiny shapes."""

import jax.numpy as jnp
import numpy as np

from amss_tpu.models.dpcl import dpcl_loss


def _naive(v, y, w):
    b = v.shape[0]
    out = []
    for i in range(b):
        sw = np.sqrt(w[i]).reshape(-1)[:, None]
        vv = v[i].reshape(-1, v.shape[-1]) * sw
        yy = y[i].reshape(-1, y.shape[-1]) * sw
        a = vv @ vv.T - yy @ yy.T
        out.append((a**2).sum() / max(w[i].sum(), 1.0) ** 2)
    return np.mean(out)


def test_gram_equals_naive(rng):
    b, t, f, e, s = 2, 6, 5, 4, 2
    v = rng.standard_normal((b, t, f, e)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    dom = rng.integers(0, s, (b, t, f))
    y = np.eye(s, dtype=np.float32)[dom]
    w = (rng.random((b, t, f)) > 0.3).astype(np.float32)
    got = float(dpcl_loss(jnp.asarray(v), jnp.asarray(y), jnp.asarray(w)))
    want = _naive(v, y, w)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_perfect_embedding_zero_loss(rng):
    # V == one-hot Y (up to rotation) gives VV^T == YY^T → loss 0.
    b, t, f, s = 1, 4, 3, 2
    dom = rng.integers(0, s, (b, t, f))
    y = np.eye(s, dtype=np.float32)[dom]
    w = np.ones((b, t, f), np.float32)
    loss = float(dpcl_loss(jnp.asarray(y), jnp.asarray(y), jnp.asarray(w)))
    assert abs(loss) < 1e-6
