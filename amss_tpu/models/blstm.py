"""Bidirectional LSTM as XLA `lax.scan`, tuned for the MXU.

Capability parity: the reference's tf.nn.bidirectional_dynamic_rnn + LSTMCell
stack (SURVEY.md §2.3, §2.8 item 5).  TPU-first design (SURVEY.md §7 hard
parts):

  * The input projection ``x @ Wx`` for ALL timesteps is hoisted OUT of the
    scan into one big ``[B*T, 4H]`` matmul — the MXU sees a large batched GEMM
    instead of T tiny ones.  The scan body does only the ``h @ Wh`` recurrent
    matmul plus fused elementwise gates.
  * All four gates live in one fused ``[*, 4H]`` tensor (single matmul, single
    bias add, one slice per gate).
  * Bidirectionality = the same scan on the time-reversed input; both
    directions share code and the reverse is a `jnp.flip` (layout op).
  * Variable length: a ``[B, T]`` mask freezes the carried (h, c) at padded
    steps and zeroes outputs, so bucketed batches of mixed lengths are exact.
  * Optional `jax.checkpoint` per layer: activations for the backward pass are
    rematerialized, halving HBM residency for deep stacks.
  * Compute dtype is configurable: bf16 gate matmuls with f32 cell state
    (``compute_dtype="bfloat16"``).  Verified on the v5e chip (round 2): the
    full c1 train step compiles and runs in bf16 — the round-1 ">30 min
    compile hang" did not reproduce at tiny or production shapes (see
    NOTES_r2.md for the staged repro evidence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _init_dense(key, n_in: int, n_out: int, scale: float | None = None):
    if scale is None:
        scale = 1.0 / jnp.sqrt(n_in)
    return {
        "w": jax.random.uniform(key, (n_in, n_out), jnp.float32, -scale, scale),
        "b": jnp.zeros((n_out,), jnp.float32),
    }


def dense(params, x, compute_dtype=jnp.float32):
    w = params["w"].astype(compute_dtype)
    y = jnp.matmul(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    return y + params["b"]


def init_lstm_layer(key, n_in: int, hidden: int) -> dict:
    kx, kh = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(hidden)
    p = {
        "wx": jax.random.uniform(kx, (n_in, 4 * hidden), jnp.float32, -scale, scale),
        "wh": jax.random.uniform(kh, (hidden, 4 * hidden), jnp.float32, -scale, scale),
        "b": jnp.zeros((4 * hidden,), jnp.float32),
    }
    # Forget-gate bias 1.0: standard stabilizer for speech-length sequences.
    p["b"] = p["b"].at[hidden : 2 * hidden].set(1.0)
    return p


def init_blstm_stack(key, n_in: int, hidden: int, layers: int) -> list[dict]:
    """Per-layer params; layer 0 input n_in, deeper layers input 2*hidden."""
    keys = jax.random.split(key, 2 * layers)
    stack = []
    for l in range(layers):
        d = n_in if l == 0 else 2 * hidden
        stack.append(
            {
                "fwd": init_lstm_layer(keys[2 * l], d, hidden),
                "bwd": init_lstm_layer(keys[2 * l + 1], d, hidden),
            }
        )
    return stack


def _bilstm_fused_scan(
    params: dict,  # {"fwd": layer params, "bwd": layer params}
    x: jnp.ndarray,  # [B, T, In]
    mask: jnp.ndarray | None,
    compute_dtype=jnp.float32,
    unroll: int = 1,
) -> jnp.ndarray:
    """Both directions in ONE lax.scan: direction is a leading batch axis of a
    batched matmul, so each sequential step runs a single fused
    [2, B, H] x [2, H, 4H] dot_general instead of two separate scans — halves
    the scan-step launch overhead that dominates BLSTM time on TPU."""
    b, t, _ = x.shape
    hidden = params["fwd"]["wh"].shape[0]

    wx = jnp.stack([params["fwd"]["wx"], params["bwd"]["wx"]]).astype(compute_dtype)
    wh = jnp.stack([params["fwd"]["wh"], params["bwd"]["wh"]]).astype(compute_dtype)
    bias = jnp.stack([params["fwd"]["b"], params["bwd"]["b"]])  # [2, 4H]

    xd = jnp.stack([x, jnp.flip(x, axis=1)])  # [2, B, T, In]
    # Hoisted input projection: one batched [2, B*T, 4H] MXU matmul.
    xproj = (
        jnp.einsum(
            "dbti,dig->dbtg",
            xd.astype(compute_dtype),
            wx,
            preferred_element_type=jnp.float32,
        )
        + bias[:, None, None, :]
    )
    xproj_t = jnp.moveaxis(xproj, 2, 0)  # [T, 2, B, 4H]
    if mask is not None:
        md = jnp.stack([mask, jnp.flip(mask, axis=1)])  # [2, B, T]
        mask_t = jnp.moveaxis(md, 2, 0)[..., None]  # [T, 2, B, 1]
        xs = (xproj_t, mask_t)
    else:
        xs = xproj_t

    def step(carry, inputs):
        h, c = carry  # [2, B, H] each
        if mask is None:
            gates_in, m = inputs, None
        else:
            gates_in, m = inputs
        gates = gates_in + jnp.einsum(
            "dbh,dhg->dbg",
            h.astype(compute_dtype),
            wh,
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[..., :hidden])
        f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
        g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[..., 3 * hidden :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if m is not None:
            c_new = jnp.where(m > 0, c_new, c)
            h_new = jnp.where(m > 0, h_new, h)
            out = jnp.where(m > 0, h_new, 0.0)
        else:
            out = h_new
        return (h_new, c_new), out

    init = (
        jnp.zeros((2, b, hidden), jnp.float32),
        jnp.zeros((2, b, hidden), jnp.float32),
    )
    # `unroll` amortizes the per-step loop overhead that dominates BLSTM
    # serving time on TPU (the step's [2,B,H]x[2,H,4H] dot is tiny next to
    # the sequential-step latency — headline_bisect_r5).  Same math; XLA may
    # fuse the unrolled block differently (~1e-8 differences at unroll>=4).
    _, out_t = jax.lax.scan(step, init, xs, unroll=unroll)  # [T, 2, B, H]
    out = jnp.moveaxis(out_t, 0, 2)  # [2, B, T, H]
    return jnp.concatenate([out[0], jnp.flip(out[1], axis=1)], axis=-1)


def blstm_stack(
    stack: list[dict],
    x: jnp.ndarray,  # [B, T, F]
    mask: jnp.ndarray | None = None,  # [B, T]
    compute_dtype=jnp.float32,
    remat: bool = True,
    dropout_rate: float = 0.0,
    rng=None,  # None = deterministic (eval); dropout applies between layers
    unroll: int = 1,
) -> jnp.ndarray:
    """Run the BLSTM stack -> [B, T, 2*hidden]."""

    def layer(params, h, r):
        out = _bilstm_fused_scan(params, h, mask, compute_dtype=compute_dtype,
                                 unroll=unroll)
        if r is not None and dropout_rate > 0.0:
            from amss_tpu.models.dprnn import dropout

            out = dropout(r, out, dropout_rate)
        return out

    layer_fn = jax.checkpoint(layer) if remat else layer
    rngs = (
        jax.random.split(rng, len(stack)) if rng is not None else [None] * len(stack)
    )
    h = x
    for params, r in zip(stack, rngs):
        h = layer_fn(params, h, r)
    return h
