"""Fused decoder-matmul + overlap-add Pallas kernels (scatter-free).

SURVEY.md §2.8 item 3: transposed-conv1d decoder + overlap-add.  Entry points:

  * pallas_decode_ola(codes, basis, hop): the FUSED synthesis path — per grid
    program, DMA a halo'd block of code rows into VMEM, matmul with the
    synthesis basis ([K, win]: learned filterbank, or window-folded inverse
    DFT for iSTFT), and overlap-add inside VMEM.  The intermediate frame
    tensor ``[B, NF, win]`` (a win/hop-fold expansion) never exists in HBM.
  * pallas_overlap_add(frames, hop): OLA alone (identity basis).

OLA is gather-formulated: each output hop-chunk SUMS its r overlapping frame
segments — programs never write-collide (no scatter, no atomics).  Mosaic
alignment: DMA row offsets are CHUNKS_BLK-multiples; in-kernel combines use
pltpu.roll + offset-0 slices only; the output block keeps a 128-lane minor dim
(chunks padded hop->128 lanes), un-padded by the jnp wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNKS_BLK = 128  # output hop-chunks per grid program


def _decode_ola_kernel(codes_hbm, w_ref, out_ref, scratch, sem, *, r, cb, hop):
    b = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        codes_hbm.at[b, pl.ds(j * cb, cb + 8), :],  # 8 >= r-1 halo, sublane-aligned
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    frames = jnp.dot(
        scratch[:, :],
        w_ref[:, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Chunk o (global j*cb+o) = sum_i frames[o + (r-1) - i, i*hop:(i+1)*hop]
    # (host pre-pads codes with r-1 zero head rows).  Offset-0 slices of rolled
    # values keep Mosaic happy.
    acc = jnp.zeros((cb, hop), jnp.float32)
    nrows = cb + 8
    win = frames.shape[1]
    for i in range(r):
        # left-rolls expressed as non-negative right-rolls (pltpu.roll contract)
        shifted = pltpu.roll(frames, (nrows - (r - 1 - i)) % nrows, axis=0)
        seg = pltpu.roll(shifted, (win - i * hop) % win, axis=1)
        acc = acc + seg[:cb, :hop]
    if hop < 128:  # static: pad hop lanes up to the 128-lane output block
        pad = jnp.zeros((cb, 128 - hop), jnp.float32)
        acc = jnp.concatenate([acc, pad], axis=-1)
    out_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def _decode_ola_padded(codes_pad, basis, hop: int, interpret: bool = False):
    b, rows, k = codes_pad.shape
    _, win = basis.shape
    r = win // hop
    n_chunks = rows - 8
    n_j = n_chunks // CHUNKS_BLK
    kernel = functools.partial(_decode_ola_kernel, r=r, cb=CHUNKS_BLK, hop=hop)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_j),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, win), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, CHUNKS_BLK, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CHUNKS_BLK + 8, k), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(codes_pad, basis)
    return out[:, :, :hop].reshape(b, n_chunks * hop)


def _decode_ola_impl(codes, basis, hop: int, length, interpret: bool):
    b, nf, k = codes.shape
    k2, win = basis.shape
    assert k2 == k and win % hop == 0 and hop % 8 == 0 and hop <= 128
    r = win // hop
    assert r - 1 <= 8, "halo of 8 rows covers r-1 overlaps"
    t_full = (nf - 1) * hop + win  # == (nf + r - 1) * hop
    n_chunks = nf + r - 1
    n_chunks_pad = -(-n_chunks // CHUNKS_BLK) * CHUNKS_BLK
    # r-1 zero head rows (negative-frame halo); tail covers padded chunks + DMA halo.
    head = r - 1
    tail = (n_chunks_pad + 8) - (head + nf)
    k_pad = -(-k // 128) * 128
    codes_pad = jnp.pad(codes, ((0, 0), (head, tail), (0, k_pad - k)))
    basis_pad = jnp.pad(basis.astype(jnp.float32), ((0, k_pad - k), (0, 0)))
    y = _decode_ola_padded(codes_pad, basis_pad, hop, interpret)
    y = y[:, :t_full]
    if length is not None:
        y = y[:, :length] if length <= t_full else jnp.pad(y, ((0, 0), (0, length - t_full)))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _decode_ola_ad(codes, basis, hop: int, length, interpret: bool):
    return _decode_ola_impl(codes, basis, hop, length, interpret)


def _do_fwd(codes, basis, hop, length, interpret):
    return _decode_ola_impl(codes, basis, hop, length, interpret), (codes, basis)


def _do_bwd(hop, length, interpret, res, g):
    """Adjoint of decode+OLA IS framing+matmul: d/dcodes rides the fused
    framed_matmul kernel; d/dbasis is a codes^T @ frames(g) einsum."""
    from amss_tpu.ops.framing import frame_signal
    from amss_tpu.ops.pallas.framed_matmul import framed_matmul

    codes, basis = res
    nf = codes.shape[1]
    win = basis.shape[1]
    t_full = (nf - 1) * hop + win
    # Undo the wrapper's trim/pad so g covers the full OLA extent.
    if g.shape[-1] < t_full:
        g = jnp.pad(g, ((0, 0), (0, t_full - g.shape[-1])))
    else:
        g = g[:, :t_full]
    dcodes = framed_matmul(g, basis.T, hop, interpret=interpret)
    gframes = frame_signal(g, win, hop)
    dbasis = jnp.einsum(
        "bnk,bnw->kw", codes, gframes, preferred_element_type=jnp.float32
    ).astype(basis.dtype)
    return dcodes, dbasis


_decode_ola_ad.defvjp(_do_fwd, _do_bwd)


def pallas_decode_ola(
    codes: jnp.ndarray,  # [B, NF, K]
    basis: jnp.ndarray,  # [K, win]
    hop: int,
    length: int | None = None,
    interpret: bool = False,
    force: bool = False,
) -> jnp.ndarray:
    """overlap_add(codes @ basis, hop) without materializing frames in HBM.
    Differentiable: the VJP reuses the fused framed_matmul kernel (adjoint pair).

    Requires win % hop == 0, hop % 8 == 0, hop <= 128, win//hop <= 9.
    Falls back to XLA matmul+overlap_add at shapes where the fused kernel
    loses (same gate as framed_matmul — the adjoint pair must dispatch
    together or a short-filter front pays the kernel's small-tile penalty on
    the backward pass); ``force=True`` keeps the kernel (tests)."""
    from amss_tpu.ops.framing import overlap_add
    from amss_tpu.ops.pallas.framed_matmul import pallas_profitable

    if not force and not pallas_profitable(basis.shape[1], hop):
        frames = jnp.matmul(codes, basis, preferred_element_type=jnp.float32,
                            precision="highest")
        return overlap_add(frames, hop, length=length)
    return _decode_ola_ad(codes, basis, hop, length, interpret)


def pallas_overlap_add(
    frames: jnp.ndarray,  # [B, NF, win]
    hop: int,
    length: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """OLA alone via the fused kernel with an identity basis (test/compat path;
    production uses pallas_decode_ola which folds the matmul in)."""
    win = frames.shape[-1]
    eye = jnp.eye(win, dtype=jnp.float32)
    return pallas_decode_ola(frames, eye, hop, length=length, interpret=interpret)
