"""Sequence-parallel framing: time-axis sharding with halo exchange.

SURVEY.md §2.7 SP row: "shard time axis across chips with halo exchange of
(window-hop) boundary samples for framing/OLA".  These models have no
attention, so this is the only sequence-parallel primitive the domain needs —
it lets one arbitrarily long waveform's ANALYSIS run across a mesh when a
single chip's HBM would not hold the frames.

Mechanism (shard_map over a 1-D ``time`` axis):
  * each device holds a contiguous signal shard [B, T/P];
  * the (win - hop)-sample left-edge of each shard is sent to the LEFT
    neighbor over ICI (one lax.ppermute) so every device can build its final
    overlapping frames locally;
  * devices then run the standard framing+DFT matmul on shard+halo — no
    other communication; output frames stay sharded over ``time``.

The wrap-around frames of the last device are invalid by construction and
trimmed by the wrapper (the true global frame count is T/hop - (win/hop - 1)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from amss_tpu.ops.stft import dft_matrices, hann_window
from amss_tpu.ops.framing import frame_signal


def sharded_stft_ri(
    x: jnp.ndarray,  # [B, T]; T divisible by (P * hop)
    win: int,
    hop: int,
    mesh: Mesh,
    axis: str = "time",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Time-sharded STFT -> (re, im) [B, NF, F], NF = (T - win)//hop + 1.

    Communication: ONE ppermute of (win - hop) samples per device boundary.
    """
    b, t = x.shape
    p = mesh.shape[axis]
    if t % (p * hop) != 0 or win % hop != 0:
        raise ValueError(f"need T % (P*hop) == 0 and win % hop == 0; {t=} {p=}")
    halo = win - hop
    window = hann_window(win)
    c, s = dft_matrices(win)
    basis = jnp.asarray(window[:, None] * np.concatenate([c, s], axis=1))
    f = c.shape[1]

    def local(xl, basis):
        # xl: [B, T/P].  Send our left edge to the LEFT neighbor, so each
        # device receives its RIGHT halo.
        perm = [(i, (i - 1) % p) for i in range(p)]
        right_halo = jax.lax.ppermute(xl[:, :halo], axis, perm)
        xfull = jnp.concatenate([xl, right_halo], axis=1)  # [B, T/P + halo]
        frames = frame_signal(xfull, win, hop)  # [B, (T/P)/hop frames, win]
        out = jnp.matmul(
            frames, basis, preferred_element_type=jnp.float32, precision="highest"
        )
        return out

    shard_fn = jax.shard_map(
        functools.partial(local),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None)),
        out_specs=P(None, axis, None),
    )
    out = shard_fn(x, basis)  # [B, T/hop, 2F] sharded over frames
    nf = (t - win) // hop + 1
    out = out[:, :nf]  # trim the last device's wrap-around frames
    return out[..., :f], out[..., f:]
