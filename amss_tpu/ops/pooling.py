"""Max-pool-with-argmax / argmax-unpool over time.

Capability parity: TF's ``max_pool_with_argmax`` + the reference's unpool op in
the adaptive filterbank (SURVEY.md §2.2, §2.8 item 4).  Bit-exactness notes:

  * Tie-break is FIRST maximum (jnp.argmax semantics == TF semantics), pinned
    by tests/test_pooling.py, so encoder->decoder waveforms are reproducible.
  * Indices are the within-window offset (int32 in [0, pool)), not flattened
    global indices — cheaper to carry and enough to invert.
  * Unpool is branchless: a one-hot (i == idx) multiply, never a scatter, so
    XLA keeps it a fused vector op.
"""

from __future__ import annotations

import jax.numpy as jnp


def max_pool_argmax(x: jnp.ndarray, pool: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pool ``x[..., T, N]`` over time -> (values ``[..., T/pool, N]``, idx int32).

    T must be divisible by ``pool``.
    """
    *lead, t, n = x.shape
    if t % pool != 0:
        raise ValueError(f"time length {t} not divisible by pool {pool}")
    xr = x.reshape(*lead, t // pool, pool, n)
    idx = jnp.argmax(xr, axis=-2).astype(jnp.int32)  # first-max tie-break
    # Values via max, NOT take_along_axis: the value at the first argmax IS
    # the max, and the gather lowers catastrophically on TPU (measured 55 ms
    # of a 56 ms encoder at b16 x 16384 — encode_bisect_r4 in
    # quality_results.jsonl; jnp.max is a plain VPU reduction).
    vals = jnp.max(xr, axis=-2)
    return vals, idx


def unpool_argmax(vals: jnp.ndarray, idx: jnp.ndarray, pool: int) -> jnp.ndarray:
    """Inverse of max_pool_argmax: place vals at their argmax slots, zeros elsewhere.

    vals, idx: ``[..., T/pool, N]`` -> ``[..., T, N]``.
    """
    *lead, tp, n = vals.shape
    slots = jnp.arange(pool, dtype=jnp.int32).reshape(
        *([1] * len(lead)), 1, pool, 1
    )
    onehot = (slots == idx[..., None, :]).astype(vals.dtype)
    out = onehot * vals[..., None, :]
    return out.reshape(*lead, tp * pool, n)
