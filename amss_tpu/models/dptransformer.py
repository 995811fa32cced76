"""Dual-path transformer trunk (SepFormer-style) — `sep.trunk = "dpt"`.

Capability extension beyond the reference's flat BLSTM stack (SURVEY.md
§2.3), following the trunk-shape trajectory the round-1/2 studies measured
(flat BLSTM < dual-path < dilated TCN): SepFormer (Subakhy et al. 2021,
"Attention is all you need in speech separation") replaces the dual-path
RNNs of models/dprnn.py with transformer blocks over the same
[P chunks x K frames] factorization of the frame axis:

  * INTRA-chunk self-attention + FFN over K (local structure),
  * INTER-chunk self-attention + FFN over P (long-range speaker continuity),

pre-LN residual blocks, sinusoidal positional encoding per path.

This is the most TPU-native trunk shape of all four: ZERO sequential steps
(the TCN still chains `blocks x repeats` convs; attention is two batched
matmuls per path on the MXU), and the dual-path chunking bounds the
attention cost at K^2 + P^2 per frame pair instead of T'^2, exactly the
blockwise trick long-context TPU stacks use.  All shapes are static; the
padding mask rides additively into the attention logits so bucketed
variable-length batches stay exact (same contract as dprnn_stack).

Plugs into the shared separator base (models/base.py::trunk) and therefore
into every head: DPCL / L41 / Chimera / TasNet masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amss_tpu.models.blstm import _init_dense, dense
from amss_tpu.models.dprnn import _init_layer_norm, dropout, layer_norm

_NEG = -1e9  # additive logit mask for padded keys


def _init_attn(key, d_model: int) -> dict:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": _init_dense(kq, d_model, d_model),
        "wk": _init_dense(kk, d_model, d_model),
        "wv": _init_dense(kv, d_model, d_model),
        "wo": _init_dense(ko, d_model, d_model),
    }


def _init_path(key, d_model: int, ffn_dim: int) -> dict:
    ka, k1, k2 = jax.random.split(key, 3)
    return {
        "ln1": _init_layer_norm(d_model),
        "attn": _init_attn(ka, d_model),
        "ln2": _init_layer_norm(d_model),
        "ffn": {
            "w1": _init_dense(k1, d_model, ffn_dim),
            "w2": _init_dense(k2, ffn_dim, d_model),
        },
    }


def init_dpt(
    key, n_in: int, d_model: int, ffn_dim: int, blocks: int
) -> dict:
    """Params: input projection F -> D plus `blocks` dual-path blocks."""
    keys = jax.random.split(key, 2 * blocks + 1)
    return {
        "in_proj": _init_dense(keys[0], n_in, d_model),
        "blocks": [
            {
                "intra": _init_path(keys[2 * i + 1], d_model, ffn_dim),
                "inter": _init_path(keys[2 * i + 2], d_model, ffn_dim),
            }
            for i in range(blocks)
        ],
    }


def _sinusoid(length: int, dim: int) -> jnp.ndarray:
    """Standard fixed sinusoidal positional encoding [length, dim] (f32).
    Computed at trace time from static shapes — a compile-time constant."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    i = jnp.arange(dim // 2, dtype=jnp.float32)[None, :]
    ang = pos / jnp.power(10000.0, 2.0 * i / dim)
    pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if pe.shape[-1] < dim:  # odd d_model
        pe = jnp.pad(pe, ((0, 0), (0, dim - pe.shape[-1])))
    return pe


def _mha(p: dict, x: jnp.ndarray, mask, heads: int, compute_dtype):
    """Multi-head self-attention.  x [N, L, D]; mask [N, L] 1=valid keys.
    Logits/softmax accumulate in f32 (preferred_element_type in `dense`);
    padded KEYS are masked out — padded query rows are zeroed by the caller's
    end-of-block mask multiply, matching dprnn_stack's contract."""
    n, l, d = x.shape
    dh = d // heads
    q = dense(p["wq"], x, compute_dtype).reshape(n, l, heads, dh)
    k = dense(p["wk"], x, compute_dtype).reshape(n, l, heads, dh)
    v = dense(p["wv"], x, compute_dtype).reshape(n, l, heads, dh)
    # [N, H, Lq, Lk]
    logits = jnp.einsum(
        "nqhd,nkhd->nhqk",
        q.astype(compute_dtype),
        k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    if mask is not None:  # padded keys -> -1e9 before softmax
        logits = logits + (mask[:, None, None, :].astype(jnp.float32) - 1.0) * (-_NEG)
    a = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum(
        "nhqk,nkhd->nqhd",
        a.astype(compute_dtype),
        v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(n, l, d)
    return dense(p["wo"], o, compute_dtype)


def _path(p, x, mask, heads, compute_dtype, rate, rng):
    """One transformer half-block (pre-LN): x + Attn(LN(x)), then
    x + FFN(LN(x)).  x [N, L, D] -> [N, L, D]."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    pe = _sinusoid(x.shape[1], x.shape[2])
    h = x + dropout(
        r1, _mha(p["attn"], layer_norm(p["ln1"], x + pe), mask, heads,
                 compute_dtype), rate
    )
    f = dense(p["ffn"]["w2"],
              jax.nn.relu(dense(p["ffn"]["w1"], layer_norm(p["ln2"], h),
                                compute_dtype)),
              compute_dtype)
    return h + dropout(r2, f, rate)


def dpt_stack(
    params: dict,
    x: jnp.ndarray,  # [B, T', F]
    mask: jnp.ndarray | None = None,  # [B, T'] 1=valid
    chunk_frames: int = 16,
    heads: int = 4,
    compute_dtype=jnp.float32,
    remat: bool = True,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """-> [B, T', D].  Same non-overlapping K-frame segmentation and padding
    contract as dprnn_stack (padded frames exactly zero on output)."""
    b, t, _ = x.shape
    k = chunk_frames
    p_chunks = -(-t // k)
    t_pad = p_chunks * k
    d = params["in_proj"]["w"].shape[1]

    h = dense(params["in_proj"], x, compute_dtype)  # [B, T', D]
    m = mask
    if t_pad != t:
        h = jnp.pad(h, ((0, 0), (0, t_pad - t), (0, 0)))
        # always materialize a mask when padding is introduced so padded
        # frames never attract attention mass
        m = jnp.ones((b, t), x.dtype) if m is None else m
        m = jnp.pad(m, ((0, 0), (0, t_pad - t)))

    h = h.reshape(b, p_chunks, k, d)
    m_g = None if m is None else m.reshape(b, p_chunks, k)

    def block(bp, h, rng):
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        # intra: chunks fold into batch -> [B*P, K, D]
        hi = h.reshape(b * p_chunks, k, d)
        mi = None if m_g is None else m_g.reshape(b * p_chunks, k)
        h = _path(bp["intra"], hi, mi, heads, compute_dtype, dropout_rate,
                  r1).reshape(b, p_chunks, k, d)
        # inter: frame positions fold into batch -> [B*K, P, D]
        ht = jnp.swapaxes(h, 1, 2).reshape(b * k, p_chunks, d)
        mt = (None if m_g is None
              else jnp.swapaxes(m_g, 1, 2).reshape(b * k, p_chunks))
        h = jnp.swapaxes(
            _path(bp["inter"], ht, mt, heads, compute_dtype, dropout_rate,
                  r2).reshape(b, k, p_chunks, d), 1, 2)
        if m_g is not None:  # keep padded positions exactly zero downstream
            h = h * m_g[..., None]
        return h

    block_fn = jax.checkpoint(block) if remat else block
    rngs = (
        jax.random.split(rng, len(params["blocks"]))
        if rng is not None
        else [None] * len(params["blocks"])
    )
    for bp, r in zip(params["blocks"], rngs):
        h = block_fn(bp, h, r)

    return h.reshape(b, t_pad, d)[:, :t]
