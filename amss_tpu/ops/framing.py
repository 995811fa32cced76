"""Framing and overlap-add, XLA-friendly (static shapes, no gathers when avoidable).

Capability parity: the reference's framing lived inside tf.contrib.signal.stft /
inverse_stft (SURVEY.md §2.2).  TPU design notes:

  * When ``win % hop == 0`` (the only case the recipes use), framing is a
    pad -> reshape -> static-slice -> concat: pure layout ops XLA fuses away.
    No gather, no dynamic shapes.
  * Overlap-add is the transpose of that: split each frame into ``r = win//hop``
    hop-sized chunks and sum ``r`` shifted views.  A static Python loop of
    length ``r`` (2-8 in practice), each iteration a slice+add — fuses into a
    handful of vector adds, no scatter.
"""

from __future__ import annotations

import jax.numpy as jnp


def num_frames(t: int, win: int, hop: int) -> int:
    """Number of full frames covering a length-``t`` signal (no padding)."""
    if t < win:
        return 0
    return 1 + (t - win) // hop


def frame_signal(x: jnp.ndarray, win: int, hop: int) -> jnp.ndarray:
    """Slice ``x[..., T]`` into overlapping frames ``[..., num_frames, win]``.

    Requires win % hop == 0 for the reshape fast path; falls back to a gather
    otherwise.
    """
    t = x.shape[-1]
    nf = num_frames(t, win, hop)
    if nf <= 0:
        raise ValueError(f"signal length {t} shorter than window {win}")

    if win % hop == 0:
        r = win // hop
        # Blocks of size hop covering everything the frames touch.
        needed = (nf - 1) * hop + win
        nblocks = needed // hop  # needed is a multiple of hop
        blocks = x[..., : nblocks * hop].reshape(*x.shape[:-1], nblocks, hop)
        # frame[f] = concat(blocks[f], blocks[f+1], ..., blocks[f+r-1])
        parts = [blocks[..., i : i + nf, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)

    # General case: index gather.
    idx = jnp.arange(win)[None, :] + hop * jnp.arange(nf)[:, None]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int, length: int | None = None) -> jnp.ndarray:
    """Overlap-add frames ``[..., num_frames, win]`` back to ``[..., T]``.

    T = (num_frames - 1) * hop + win unless ``length`` trims/zero-pads.
    Requires win % hop == 0 (all recipes satisfy this).
    """
    *lead, nf, win = frames.shape
    if win % hop != 0:
        raise ValueError(f"overlap_add requires win % hop == 0, got {win} % {hop}")
    r = win // hop
    t_full = (nf - 1) * hop + win
    nblocks = t_full // hop

    out = jnp.zeros((*lead, nblocks, hop), frames.dtype)
    # Each frame contributes r hop-chunks at block offsets f, f+1, ..., f+r-1.
    chunks = frames.reshape(*lead, nf, r, hop)
    for i in range(r):
        pad = [(0, 0)] * len(lead) + [(i, nblocks - nf - i), (0, 0)]
        out = out + jnp.pad(chunks[..., :, i, :], pad)
    out = out.reshape(*lead, t_full)
    if length is not None:
        if length <= t_full:
            out = out[..., :length]
        else:
            pad = [(0, 0)] * len(lead) + [(0, length - t_full)]
            out = jnp.pad(out, pad)
    return out
