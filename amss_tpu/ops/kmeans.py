"""On-device k-means (vmapped Lloyd iterations).

Capability parity: the reference ran sklearn KMeans on host per utterance at
DPCL inference (SURVEY.md §2.4) — the big host round-trip the TPU build must
eliminate (BASELINE.json:5, :11).  Design for jit:

  * Fixed iteration count (lax.fori_loop) — no convergence-dependent shapes.
  * Deterministic farthest-point init (no host RNG round-trip): first centroid
    is the highest-weighted-energy point, each next maximizes the weighted
    min-distance to those already chosen.  k is tiny (2-4) so this is a static
    Python loop of k distance sweeps.
  * Point weights mask out padding / silent TF bins (SURVEY.md §7 hard parts).
  * Empty clusters keep their previous centroid — branchless jnp.where.
  * Batch via jax.vmap (one utterance per lane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _pairwise_sq_dist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """||x_i - c_j||^2 for x [N, E], c [K, E] -> [N, K] (MXU-friendly form)."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    cc = jnp.sum(c * c, axis=-1)[None, :]
    xc = jnp.matmul(x, c.T, preferred_element_type=jnp.float32)
    return jnp.maximum(xx - 2.0 * xc + cc, 0.0)


def _farthest_point_init(x: jnp.ndarray, weights: jnp.ndarray, k: int) -> jnp.ndarray:
    """Deterministic k-means++-style seeding without RNG."""
    score = weights * jnp.sum(x * x, axis=-1)
    first = jnp.argmax(score)
    centroids = [x[first]]
    for _ in range(1, k):
        d = _pairwise_sq_dist(x, jnp.stack(centroids))  # [N, chosen]
        mind = jnp.min(d, axis=-1) * weights
        centroids.append(x[jnp.argmax(mind)])
    return jnp.stack(centroids)


def _kmeans_single(
    x: jnp.ndarray, weights: jnp.ndarray, k: int, iters: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    init = _farthest_point_init(x, weights, k)

    def body(_, c):
        d = _pairwise_sq_dist(x, c)  # [N, K]
        assign = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype) * weights[:, None]
        counts = jnp.sum(onehot, axis=0)  # [K]
        sums = jnp.matmul(onehot.T, x, preferred_element_type=jnp.float32)
        new_c = sums / jnp.maximum(counts[:, None], _EPS)
        return jnp.where(counts[:, None] > _EPS, new_c, c)

    c = jax.lax.fori_loop(0, iters, body, init)
    assign = jnp.argmin(_pairwise_sq_dist(x, c), axis=-1)
    return c, assign


def soft_assignments(
    x: jnp.ndarray, centroids: jnp.ndarray, tau: float = 0.25
) -> jnp.ndarray:
    """Distance-softmax soft cluster masks: ``[..., N, E] x [..., K, E] ->
    [..., N, K]``.  tau is relative to the mean point-to-centroid distance, so
    the sharpness is scale-free (embeddings are unit-norm-ish)."""
    if x.ndim == 3:
        d = jax.vmap(_pairwise_sq_dist)(x, centroids)
    else:
        d = _pairwise_sq_dist(x, centroids)
    scale = jnp.mean(d, axis=(-2, -1), keepdims=True) + _EPS
    return jax.nn.softmax(-d / (tau * scale), axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    x: jnp.ndarray,
    k: int,
    iters: int = 10,
    weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Lloyd k-means on device.

    x: ``[N, E]`` or batched ``[B, N, E]``.
    weights: optional ``[N]`` / ``[B, N]`` nonneg point weights (0 = ignore).
    Returns (centroids ``[..., K, E]``, assignments int32 ``[..., N]``).
    """
    if x.ndim == 2:
        w = jnp.ones(x.shape[0], x.dtype) if weights is None else weights
        c, a = _kmeans_single(x, w, k, iters)
        return c, a.astype(jnp.int32)
    if x.ndim == 3:
        w = jnp.ones(x.shape[:2], x.dtype) if weights is None else weights
        c, a = jax.vmap(lambda xi, wi: _kmeans_single(xi, wi, k, iters))(x, w)
        return c, a.astype(jnp.int32)
    raise ValueError(f"kmeans expects [N,E] or [B,N,E], got {x.shape}")
