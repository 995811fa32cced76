"""On-device k-means: convergence on separable blobs, weights mask padding."""

import jax.numpy as jnp
import numpy as np

from amss_tpu.ops.kmeans import kmeans


def _blobs(rng, n_per, centers, scale=0.05):
    pts = np.concatenate(
        [c + scale * rng.standard_normal((n_per, len(c))) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(len(centers)), n_per)
    return pts, labels


def _purity(assign, labels, k):
    total = 0
    for c in range(k):
        members = labels[assign == c]
        if len(members):
            total += np.bincount(members).max()
    return total / len(labels)


def test_kmeans_separable_blobs(rng):
    pts, labels = _blobs(rng, 100, [(0, 0), (3, 3), (-3, 3)])
    c, assign = kmeans(jnp.asarray(pts), k=3, iters=10)
    assert _purity(np.asarray(assign), labels, 3) > 0.99
    assert c.shape == (3, 2)


def test_kmeans_batched(rng):
    batch = []
    lab = []
    for _ in range(4):
        pts, labels = _blobs(rng, 50, [(0, 0, 0), (4, 4, 4)])
        batch.append(pts)
        lab.append(labels)
    c, assign = kmeans(jnp.asarray(np.stack(batch)), k=2, iters=8)
    assert c.shape == (4, 2, 3)
    for b in range(4):
        assert _purity(np.asarray(assign[b]), lab[b], 2) > 0.99


def test_kmeans_weights_ignore_padding(rng):
    pts, labels = _blobs(rng, 80, [(0, 0), (5, 5)])
    # Add junk points with weight 0 at a far location.
    junk = np.full((40, 2), 100.0, np.float32)
    allpts = np.concatenate([pts, junk])
    w = np.concatenate([np.ones(160), np.zeros(40)]).astype(np.float32)
    c, assign = kmeans(jnp.asarray(allpts), k=2, iters=10, weights=jnp.asarray(w))
    # Centroids near the true blob centers, not dragged to junk.
    cs = np.sort(np.asarray(c), axis=0)
    np.testing.assert_allclose(cs[0], (0, 0), atol=0.3)
    np.testing.assert_allclose(cs[1], (5, 5), atol=0.3)
    assert _purity(np.asarray(assign[:160]), labels, 2) > 0.99
