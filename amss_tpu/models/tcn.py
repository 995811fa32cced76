"""Temporal convolutional trunk (Conv-TasNet-style TCN) — pure feed-forward.

Third trunk option beside the flat BLSTM and the dual-path DPRNN (SURVEY.md
§2.3 shared-base row; trunk shape, not size, was round 1's lever).  The TCN
(Luo & Mesgarani 2019, "Conv-TasNet: surpassing ideal time-frequency magnitude
masking") replaces recurrence entirely with stacked dilated depthwise-separable
conv blocks: R repeats of X blocks with dilations 1, 2, 4, ... 2^(X-1), each

    1x1 conv (bottleneck->H) -> PReLU -> cLN ->
    depthwise dilated conv (kernel P) -> PReLU -> cLN ->
    1x1 residual conv (H->bottleneck)  [+ 1x1 skip conv, summed across blocks]

TPU notes — this is the most MXU/XLA-friendly trunk of the three:
  * ZERO sequential steps: where a flat BLSTM runs T' scan iterations and the
    DPRNN 2*(K+P) per block, the TCN is one straight-line fused program; the
    critical path is its depth, not the sequence length.
  * The 1x1 convs (all the FLOPs) are dense [B*T', C] matmuls on the MXU.
  * The depthwise dilated conv is P shifted elementwise multiply-adds (VPU)
    that XLA fuses into the surrounding elementwise chain — no im2col, no
    gather; dilation is a static slice offset.
  * Receptive field grows exponentially: P=3, X=8, R=2 sees ~2*2^8*P frames,
    longer than the utterances we train on.

Masking: invalid (padded) frames are re-zeroed after every block so the next
block's dilated conv reads exact zeros there — identical to what a conv over
the unpadded sequence sees at its zero-padded edges, keeping bucketed
variable-length batches bit-exact with unpadded computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amss_tpu.models.blstm import _init_dense, dense
from amss_tpu.models.dprnn import _init_layer_norm, dropout, layer_norm


def _init_prelu(ch: int) -> jnp.ndarray:
    return jnp.full((ch,), 0.25, jnp.float32)


def prelu(alpha: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, alpha * x)


def _init_block(key, bottleneck: int, hidden: int, kernel: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "pw_in": _init_dense(k1, bottleneck, hidden),
        "a1": _init_prelu(hidden),
        "ln1": _init_layer_norm(hidden),
        # depthwise kernel [P, H], i.i.d. N(0, 1/P) taps (unit output variance)
        "dw": jax.random.normal(k2, (kernel, hidden), jnp.float32)
        * (1.0 / (kernel**0.5)),
        "a2": _init_prelu(hidden),
        "ln2": _init_layer_norm(hidden),
        "pw_res": _init_dense(k3, hidden, bottleneck),
        "pw_skip": _init_dense(k4, hidden, bottleneck),
    }


def init_tcn(
    key,
    n_in: int,
    bottleneck: int,
    hidden: int,
    blocks: int,
    repeats: int = 2,
    kernel: int = 3,
) -> dict:
    """Params: input 1x1 F->bottleneck, repeats*blocks conv blocks, out PReLU."""
    keys = jax.random.split(key, repeats * blocks + 1)
    return {
        "in_proj": _init_dense(keys[0], n_in, bottleneck),
        "blocks": [
            _init_block(keys[1 + r * blocks + x], bottleneck, hidden, kernel)
            for r in range(repeats)
            for x in range(blocks)
        ],
        "out_alpha": _init_prelu(bottleneck),
    }


def receptive_field_frames(blocks: int, repeats: int, kernel: int) -> int:
    """One-sided (past) receptive field of the causal TCN, in frames."""
    return repeats * (kernel - 1) * (2**blocks - 1)


def _depthwise_dilated(
    w: jnp.ndarray, x: jnp.ndarray, dilation: int, causal: bool = False
) -> jnp.ndarray:
    """Depthwise conv as P shifted scaled adds.

    w [P, C], x [B, T, C] -> [B, T, C]; zero padding (P-1)*d total —
    symmetric (non-causal) or all-left (causal: output[t] reads x[<= t])."""
    p = w.shape[0]
    if causal:
        left, right = (p - 1) * dilation, 0
    else:
        left = (p // 2) * dilation
        right = (p - 1 - p // 2) * dilation
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    t = x.shape[1]
    out = jnp.zeros_like(x)
    for i in range(p):  # static unroll; XLA fuses the P multiply-adds
        out = out + w[i] * jax.lax.dynamic_slice_in_dim(xp, i * dilation, t, axis=1)
    return out


def dw_state_shapes(
    hidden: int, blocks: int, repeats: int, kernel: int
) -> list[tuple[int, int]]:
    """Per-block streaming state shapes [(ctx_frames, channels), ...] — the
    (P-1)*dilation past depthwise-conv inputs each causal block must remember
    between pushes (infer/realtime.py)."""
    n = repeats * blocks
    return [((kernel - 1) * 2 ** (i % blocks), hidden) for i in range(n)]


def _depthwise_dilated_streaming(
    w: jnp.ndarray, ctx: jnp.ndarray, dilation: int
) -> jnp.ndarray:
    """Valid-mode causal depthwise conv over [B, (P-1)*d + T, C] -> [B, T, C].

    Arithmetically identical to _depthwise_dilated(causal=True) on the suffix:
    the ctx prefix plays the role of the left zero-padding, so streaming with
    zero-initialized state reproduces the offline computation exactly."""
    p = w.shape[0]
    t = ctx.shape[1] - (p - 1) * dilation
    out = jnp.zeros(ctx.shape[:1] + (t,) + ctx.shape[2:], ctx.dtype)
    for i in range(p):
        out = out + w[i] * jax.lax.dynamic_slice_in_dim(ctx, i * dilation, t, axis=1)
    return out


def tcn_stack_streaming(
    params: dict,
    x: jnp.ndarray,  # [B, T_new, F] new frames only
    states: list[jnp.ndarray],  # per-block [B, (P-1)*d, H] past dw inputs
    mask: jnp.ndarray | None = None,  # [B, T_new] 1=valid (stream start)
    blocks_per_repeat: int | None = None,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """Causal TCN over ONLY the new frames, carrying per-block conv state.

    -> (out [B, T_new, bottleneck], new states).  With zero-initialized
    states this computes exactly what tcn_stack(causal=True) computes for the
    same frames of the full sequence — per-frame work is O(T_new), not
    O(receptive field) (the round-2 realtime path recomputed the full window
    every push; VERDICT r2 item 1b)."""
    n_blocks = len(params["blocks"])
    xpr = blocks_per_repeat or n_blocks
    m = None if mask is None else mask[..., None].astype(x.dtype)

    h = dense(params["in_proj"], x, compute_dtype)
    if m is not None:
        h = h * m

    new_states = []
    skip_sum = jnp.zeros_like(h)
    for i, bp in enumerate(params["blocks"]):
        dil = 2 ** (i % xpr)
        u = prelu(bp["a1"], dense(bp["pw_in"], h, compute_dtype))
        u = layer_norm(bp["ln1"], u)
        ctx = jnp.concatenate([states[i], u if m is None else u * m], axis=1)
        p = bp["dw"].shape[0]
        new_states.append(ctx[:, ctx.shape[1] - (p - 1) * dil :, :])
        v = _depthwise_dilated_streaming(bp["dw"], ctx, dil)
        v = prelu(bp["a2"], v)
        v = layer_norm(bp["ln2"], v)
        res = dense(bp["pw_res"], v, compute_dtype)
        skip = dense(bp["pw_skip"], v, compute_dtype)
        h = h + res
        if m is not None:
            h = h * m
            skip = skip * m
        skip_sum = skip_sum + skip

    out = prelu(params["out_alpha"], skip_sum)
    return (out if m is None else out * m), new_states


def tcn_stack(
    params: dict,
    x: jnp.ndarray,  # [B, T', F]
    mask: jnp.ndarray | None = None,  # [B, T'] 1=valid
    blocks_per_repeat: int | None = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    dropout_rate: float = 0.0,
    rng=None,
    causal: bool = False,
) -> jnp.ndarray:
    """-> [B, T', bottleneck] (PReLU of the skip-connection sum).

    causal=True makes every dilated conv left-padded only, so output frame t
    depends exclusively on input frames <= t — the low-latency streaming mode
    (infer/realtime.py); receptive field = repeats * (P-1) * (2^X - 1)."""
    n_blocks = len(params["blocks"])
    xpr = blocks_per_repeat or n_blocks
    m = None if mask is None else mask[..., None].astype(x.dtype)

    h = dense(params["in_proj"], x, compute_dtype)
    if m is not None:
        h = h * m

    def block(bp, h, dil, r):
        u = prelu(bp["a1"], dense(bp["pw_in"], h, compute_dtype))
        u = layer_norm(bp["ln1"], u)
        v = _depthwise_dilated(bp["dw"], u if m is None else u * m, dil, causal)
        v = prelu(bp["a2"], v)
        v = layer_norm(bp["ln2"], v)
        res = dropout(r, dense(bp["pw_res"], v, compute_dtype), dropout_rate)
        skip = dense(bp["pw_skip"], v, compute_dtype)
        hn = h + res
        if m is not None:  # next block's dilated conv must read exact zeros
            hn = hn * m
            skip = skip * m
        return hn, skip

    block_fn = jax.checkpoint(block, static_argnums=(2,)) if remat else block
    rngs = (
        jax.random.split(rng, n_blocks) if rng is not None else [None] * n_blocks
    )
    skip_sum = jnp.zeros_like(h)
    for i, (bp, r) in enumerate(zip(params["blocks"], rngs)):
        h, skip = block_fn(bp, h, 2 ** (i % xpr), r)
        skip_sum = skip_sum + skip

    out = prelu(params["out_alpha"], skip_sum)
    return out if m is None else out * m
