"""Fused framing + windowed-basis matmul Pallas kernel.

This is the shared compute shape of BOTH mandated analysis kernels
(SURVEY.md §2.8 items 1-2): STFT = framing + (window-folded DFT basis) matmul;
adaptive conv1d encoder = framing + (learned filterbank) matmul.

Why a kernel: the jnp path materializes the frame tensor ``[B, T', win]`` in
HBM — a win/hop-fold (typically 4x) expansion of the signal written AND
re-read around the matmul.  Here each grid program DMAs one signal tile into
VMEM and feeds the MXU directly; frames never exist in HBM.

Mosaic alignment strategy (v5e tiling: minor dim must be 128-aligned for
memref slicing; offset-0 value slices + pltpu.roll are always legal):

  * host lays the signal out as hop-major ``xT[B, hop, NB]`` (one transpose,
    |x| traffic — vs 4|x| for frame materialization);
  * each program DMAs a 128-aligned column block ``[hop, FB+128]``;
  * frame building + windowed matmul fuse into r accumulated dot_generals:
    ``out += roll(tile, -i, lanes)[:, :FB]^T @ W[i*hop:(i+1)*hop]`` — the
    classic polyphase decomposition of a strided conv.

Requires win % hop == 0 and hop % 8 == 0 (all recipes satisfy both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amss_tpu.ops.framing import frame_signal, num_frames
from amss_tpu.ops.stft import dft_matrices, hann_window

FRAMES_BLK = 128  # frames per grid program (also the DMA column alignment)


def _kernel(xt_hbm, w_ref, out_ref, scratch, sem, *, r: int, fb: int, hop: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[b, :, pl.ds(j * fb, fb + 128)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    tile = scratch[:, :]  # [hop, fb+128]; column m = hop-block j*fb+m
    acc = jnp.zeros((fb, w_ref.shape[1]), jnp.float32)
    ncols = fb + 128
    for i in range(r):
        # left-roll by i == non-negative roll by (ncols - i) % ncols
        cols = pltpu.roll(tile, (ncols - i) % ncols, axis=1)[:, :fb]
        w_i = w_ref[i * hop : (i + 1) * hop, :]  # [hop, K]
        acc = acc + jax.lax.dot_general(
            cols,
            w_i,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def _framed_matmul_padded(xt, basis_pad, hop: int, interpret: bool = False):
    b, hop_, nb_pad = xt.shape
    win, k_pad = basis_pad.shape
    r = win // hop
    n_j = (nb_pad - 128) // FRAMES_BLK
    kernel = functools.partial(_kernel, r=r, fb=FRAMES_BLK, hop=hop)
    return pl.pallas_call(
        kernel,
        grid=(b, n_j),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xT stays in HBM; manual DMA
            pl.BlockSpec((win, k_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_BLK, k_pad), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_j * FRAMES_BLK, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hop, FRAMES_BLK + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, basis_pad)


def _framed_matmul_impl(x, basis, hop: int, interpret: bool) -> jnp.ndarray:
    b, t = x.shape
    win, k = basis.shape
    if win % hop != 0 or hop % 8 != 0:
        raise ValueError(f"framed_matmul needs win%hop==0 and hop%8==0, got {win}/{hop}")
    nf = num_frames(t, win, hop)

    nf_pad = -(-nf // FRAMES_BLK) * FRAMES_BLK
    nb_pad = nf_pad + 128  # DMA halo: last block reads cols up to nf_pad+127
    t_need = nb_pad * hop
    x_pad = jnp.pad(x, ((0, 0), (0, max(t_need - t, 0))))[:, :t_need]
    xt = jnp.transpose(x_pad.reshape(b, nb_pad, hop), (0, 2, 1))  # [B, hop, NB]

    k_pad = -(-k // 128) * 128
    basis_pad = jnp.pad(basis.astype(jnp.float32), ((0, 0), (0, k_pad - k)))

    out = _framed_matmul_padded(xt, basis_pad, hop, interpret)
    return out[:, :nf, :k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _framed_matmul_ad(x, basis, hop: int, interpret: bool):
    return _framed_matmul_impl(x, basis, hop, interpret)


def _fm_fwd(x, basis, hop, interpret):
    return _framed_matmul_impl(x, basis, hop, interpret), (x, basis)


def _fm_bwd(hop, interpret, res, g):
    """Adjoint of framing+matmul IS decoder-matmul+overlap-add: d/dx rides the
    fused OLA kernel; d/dbasis is a frames^T @ g einsum (jnp, MXU)."""
    from amss_tpu.ops.framing import frame_signal
    from amss_tpu.ops.pallas.ola import pallas_decode_ola

    x, basis = res
    win = basis.shape[0]
    dx = pallas_decode_ola(g, basis.T, hop, length=x.shape[-1], interpret=interpret)
    frames = frame_signal(x, win, hop)
    dbasis = jnp.einsum(
        "bnw,bnk->wk", frames, g, preferred_element_type=jnp.float32
    ).astype(basis.dtype)
    return dx, dbasis


_framed_matmul_ad.defvjp(_fm_fwd, _fm_bwd)


def pallas_profitable(win: int, hop: int) -> bool:
    """Shape gate: where the fused kernel actually beats XLA on the chip.

    The kernel exists to kill the win/hop-fold frame-tensor expansion in HBM;
    it wins at STFT-like shapes (win 256 / hop 64: 1.74x vs XLA, measured
    round 2).  At short-filter shapes (TasNet front, win 32 / hop 16) the
    fold is only 2x, each grid program DMAs a 16-row tile and feeds the MXU a
    ~1 MFLOP dot — measured ~50x SLOWER than XLA's reshape+concat+matmul
    (serve_bisect_r4 / front_ab rows in quality_results.jsonl: the encoder
    was 58 ms of a 61 ms forward at b16 x 16384).  Gate on the fold factor
    and the tile height."""
    return win // hop >= 4 and hop >= 64


def framed_matmul(
    x: jnp.ndarray,  # [B, T]
    basis: jnp.ndarray,  # [win, K]
    hop: int,
    interpret: bool = False,
    force: bool = False,
) -> jnp.ndarray:
    """frames(x, win, hop) @ basis -> [B, NF, K], frames never touching HBM.
    Differentiable: the VJP reuses the fused decode+OLA kernel (adjoint pair).
    Falls back to XLA framing+matmul at shapes where the kernel loses
    (pallas_profitable); ``force=True`` keeps the kernel regardless (tests)."""
    if not force and not pallas_profitable(basis.shape[0], hop):
        frames = frame_signal(x, basis.shape[0], hop)
        return jnp.matmul(frames, basis, preferred_element_type=jnp.float32,
                          precision="highest")
    return _framed_matmul_ad(x, basis, hop, interpret)


def pallas_stft_ri(
    x: jnp.ndarray, win: int, hop: int, window: np.ndarray | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused STFT: returns (re, im) like ops.stft.stft_ri, via one kernel pass
    over a [win, 2F] window-folded DFT basis."""
    if window is None:
        window = hann_window(win)
    c, s = dft_matrices(win)
    f = c.shape[1]
    basis = jnp.asarray(window[:, None] * np.concatenate([c, s], axis=1))
    out = framed_matmul(x, basis, hop, interpret=interpret)
    return out[..., :f], out[..., f:]
