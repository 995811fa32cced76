"""STFT / iSTFT as MXU matmuls.

Capability parity: tf.contrib.signal.stft / inverse_stft in the reference
(SURVEY.md §2.2, §3.2).  TPU-first design:

On TPU the FLOP budget lives in the 128x128 MXU, and window sizes here are
small (256-1024).  A windowed real DFT is just ``frames @ M`` where
``M[win, 2F]`` folds the analysis window into the DFT basis — one dense matmul
that XLA tiles straight onto the MXU and fuses with neighbours.  That beats a
generic FFT at these sizes on this hardware and — crucially — keeps the whole
front-end expressible as (layout ops + one matmul), which is also exactly the
shape the fused Pallas kernel takes (ops/pallas/framed_matmul.py).

iSTFT is the transpose: ``[re | im] @ Minv`` then synthesis-window + overlap-add
+ COLA normalization.  Perfect reconstruction is property-tested in
tests/test_stft.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from amss_tpu.ops.framing import frame_signal, overlap_add


def hann_window(win: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (the STFT-correct variant; COLA at hop=win/2^k)."""
    n = np.arange(win)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win)).astype(dtype)


@functools.lru_cache(maxsize=None)
def dft_matrices(win: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: (C, S) each [win, F] with F = win//2 + 1.

    X_re = frames @ C, X_im = frames @ S  matches np.fft.rfft
    (X_im carries the rfft sign: X[k] = sum x_n e^{-2πikn/N}).
    """
    f = win // 2 + 1
    n = np.arange(win)[:, None]
    k = np.arange(f)[None, :]
    ang = 2.0 * np.pi * n * k / win
    c = np.cos(ang).astype(np.float32)
    s = (-np.sin(ang)).astype(np.float32)
    return c, s


@functools.lru_cache(maxsize=None)
def idft_matrices(win: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT basis: (Ci, Si) each [F, win].

    frames = re @ Ci + im @ Si  inverts rfft (hermitian weights folded in).
    """
    f = win // 2 + 1
    n = np.arange(win)[None, :]
    k = np.arange(f)[:, None]
    ang = 2.0 * np.pi * n * k / win
    w = np.full((f, 1), 2.0)
    w[0] = 1.0
    if win % 2 == 0:
        w[-1] = 1.0
    ci = (w * np.cos(ang) / win).astype(np.float32)
    si = (-w * np.sin(ang) / win).astype(np.float32)
    return ci, si


def stft_ri(
    x: jnp.ndarray,
    win: int,
    hop: int,
    window: np.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """STFT of ``x[..., T]`` -> (re, im) each ``[..., num_frames, F]``.

    Real/imag stay separate float32 tensors: the axon TPU backend has no
    complex support, and two real MXU matmuls are the fast path regardless.
    """
    if window is None:
        window = hann_window(win)
    c, s = dft_matrices(win)
    wc = jnp.asarray(window[:, None] * c)
    ws = jnp.asarray(window[:, None] * s)
    frames = frame_signal(x, win, hop)
    re = jnp.matmul(frames, wc, preferred_element_type=jnp.float32, precision="highest")
    im = jnp.matmul(frames, ws, preferred_element_type=jnp.float32, precision="highest")
    return re, im


def stft(
    x: jnp.ndarray, win: int, hop: int, window: np.ndarray | None = None
) -> jnp.ndarray:
    """Complex-valued convenience wrapper (CPU tests / host analysis only —
    complex dtypes do not lower on the axon TPU backend)."""
    re, im = stft_ri(x, win, hop, window)
    return re + 1j * im


def istft_ri(
    re: jnp.ndarray,
    im: jnp.ndarray,
    win: int,
    hop: int,
    length: int | None = None,
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """Inverse STFT from (re, im) ``[..., num_frames, F]`` -> ``[..., T]``.

    Synthesis window = analysis window; output divided by the overlap-added
    squared window (COLA normalization), so stft->istft is perfect
    reconstruction away from the edges for any COLA (win, hop).
    """
    if window is None:
        window = hann_window(win)
    ci, si = idft_matrices(win)
    frames = (
        jnp.matmul(re, jnp.asarray(ci), preferred_element_type=jnp.float32, precision="highest")
        + jnp.matmul(im, jnp.asarray(si), preferred_element_type=jnp.float32, precision="highest")
    )
    frames = frames * jnp.asarray(window)
    nf = re.shape[-2]
    out = overlap_add(frames, hop, length=length)

    # COLA normalizer: overlap-add of window^2, same frame count.  Clamp
    # RELATIVE to its peak: at utterance edges the Hann norm tends to zero,
    # and masked (inconsistent) spectra would otherwise be amplified by up to
    # 1/eps there — a 30x error-energy explosion on ideal-binary-mask
    # reconstruction (found via the IBM oracle test).
    wsq = np.tile((window * window)[None, :], (nf, 1))
    norm = overlap_add(jnp.asarray(wsq), hop, length=length)
    floor = 1e-2 * jnp.max(norm)
    return out / jnp.maximum(norm, floor)


def istft(
    spec: jnp.ndarray,
    win: int,
    hop: int,
    length: int | None = None,
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """Complex-input convenience wrapper over istft_ri (CPU tests only)."""
    return istft_ri(jnp.real(spec), jnp.imag(spec), win, hop, length, window)


def log_magnitude(spec: jnp.ndarray, floor: float = 1e-7) -> jnp.ndarray:
    """Log-magnitude features, the separator input (SURVEY.md §3.2)."""
    return jnp.log(jnp.abs(spec) + floor)
