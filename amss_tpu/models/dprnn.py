"""Dual-path recurrent trunk (DPRNN-style) as stacked intra/inter-chunk scans.

Capability extension beyond the reference's flat BLSTM stack (SURVEY.md §2.3):
the round-1 study showed the 2x300 BLSTM *saturates* well below the ideal-mask
oracle on the speech-like corpus and that larger flat stacks don't help — the
lever is trunk SHAPE.  Dual-path RNNs (Luo et al. 2020, "Dual-path RNN:
efficient long sequence modeling for time-domain single-channel speech
separation") factor the T' frame axis into [P chunks x K frames] and alternate

  * an INTRA-chunk BLSTM over K (local spectro-temporal structure), and
  * an INTER-chunk BLSTM over P (long-range speaker continuity),

each followed by a linear projection + LayerNorm + residual.  This is also the
TPU-friendlier recurrence: each block runs 2*(K + P) sequential scan steps
instead of T', and the scans are ~P- (resp. K-) times wider in batch, so the
MXU sees fat [B*P, 4H] gate matmuls instead of thin ones.  With K = P = 16 a
6-block trunk does 192 sequential steps where one flat BLSTM layer over
T' = 253 does 253 — deeper model, SHORTER critical path.

Reuses the fused-gate bidirectional scan from models/blstm.py; padding masks
flow through both axes so bucketed variable-length batches stay exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amss_tpu.models.blstm import _bilstm_fused_scan, _init_dense, dense, init_lstm_layer


def _init_layer_norm(dim: int) -> dict:
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def dropout(rng, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout; identity when rng is None or rate == 0 (eval path)."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _init_path(key, d_model: int, hidden: int) -> dict:
    kf, kb, kp = jax.random.split(key, 3)
    return {
        "lstm": {
            "fwd": init_lstm_layer(kf, d_model, hidden),
            "bwd": init_lstm_layer(kb, d_model, hidden),
        },
        "proj": _init_dense(kp, 2 * hidden, d_model),
        "ln": _init_layer_norm(d_model),
    }


def init_dprnn(key, n_in: int, d_model: int, hidden: int, blocks: int) -> dict:
    """Params: input projection F -> D plus `blocks` dual-path blocks."""
    keys = jax.random.split(key, 2 * blocks + 1)
    return {
        "in_proj": _init_dense(keys[0], n_in, d_model),
        "blocks": [
            {
                "intra": _init_path(keys[2 * i + 1], d_model, hidden),
                "inter": _init_path(keys[2 * i + 2], d_model, hidden),
            }
            for i in range(blocks)
        ],
    }


def _path(p, x, mask, compute_dtype, rate, rng):
    """One half-block: BLSTM -> proj -> LN -> dropout, residual added by caller.

    x [N, L, D], mask [N, L] or None -> [N, L, D]."""
    h = _bilstm_fused_scan(p["lstm"], x, mask, compute_dtype=compute_dtype)
    h = dense(p["proj"], h, compute_dtype)
    h = layer_norm(p["ln"], h)
    return dropout(rng, h, rate)


def dprnn_stack(
    params: dict,
    x: jnp.ndarray,  # [B, T', F]
    mask: jnp.ndarray | None = None,  # [B, T'] 1=valid
    chunk_frames: int = 16,
    compute_dtype=jnp.float32,
    remat: bool = True,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """-> [B, T', D].  Non-overlapping K-frame segmentation (overlap buys
    little at K=16 spacing and would double the scan work)."""
    b, t, _ = x.shape
    k = chunk_frames
    p_chunks = -(-t // k)
    t_pad = p_chunks * k
    d = params["in_proj"]["w"].shape[1]

    h = dense(params["in_proj"], x, compute_dtype)  # [B, T', D]
    if t_pad != t:
        h = jnp.pad(h, ((0, 0), (0, t_pad - t), (0, 0)))
    m = mask
    if t_pad != t:
        # Always materialize a mask when padding is introduced so padded
        # frames never leak into the inter-chunk recurrence.
        m = jnp.ones((b, t), x.dtype) if m is None else m
    if m is not None and t_pad != t:
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
        h = h + _path(bp["intra"], hi, mi, compute_dtype, dropout_rate, r1).reshape(
            b, p_chunks, k, d
        )
        # inter: frame positions fold into batch -> [B*K, P, D]
        ht = jnp.swapaxes(h, 1, 2).reshape(b * k, p_chunks, d)
        mt = None if m_g is None else jnp.swapaxes(m_g, 1, 2).reshape(b * k, p_chunks)
        delta = _path(bp["inter"], ht, mt, compute_dtype, dropout_rate, r2)
        h = h + jnp.swapaxes(delta.reshape(b, k, p_chunks, d), 1, 2)
        if m_g is not None:  # keep padded positions exactly zero for downstream
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
