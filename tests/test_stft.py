"""STFT/iSTFT property tests: DFT-vs-numpy parity and COLA perfect reconstruction."""

import jax.numpy as jnp
import numpy as np
import pytest

from amss_tpu.ops.framing import frame_signal, overlap_add, num_frames
from amss_tpu.ops.stft import stft, istft, hann_window


def test_frame_matches_naive(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    win, hop = 64, 16
    frames = np.asarray(frame_signal(jnp.asarray(x), win, hop))
    nf = num_frames(1000, win, hop)
    assert frames.shape == (nf, win)
    for f in range(0, nf, 7):
        np.testing.assert_array_equal(frames[f], x[f * hop : f * hop + win])


def test_frame_batched(rng):
    x = rng.standard_normal((3, 2, 512)).astype(np.float32)
    frames = frame_signal(jnp.asarray(x), 128, 32)
    assert frames.shape == (3, 2, num_frames(512, 128, 32), 128)


def test_overlap_add_inverts_framing_of_constant():
    # OLA of frames of a constant signal divided by OLA of window==1 is exact.
    win, hop = 64, 16
    x = jnp.ones(640)
    frames = frame_signal(x, win, hop)
    y = overlap_add(frames, hop)
    # interior samples are covered by win/hop = 4 frames
    interior = np.asarray(y)[win : -win]
    np.testing.assert_allclose(interior, win // hop, rtol=1e-6)


def test_stft_matches_numpy_rfft(rng):
    x = rng.standard_normal(800).astype(np.float32)
    win, hop = 128, 32
    spec = np.asarray(stft(jnp.asarray(x), win, hop))
    w = hann_window(win)
    nf = num_frames(800, win, hop)
    for f in range(0, nf, 5):
        ref = np.fft.rfft(x[f * hop : f * hop + win] * w)
        np.testing.assert_allclose(spec[f], ref, atol=1e-3)


@pytest.mark.parametrize("win,hop", [(256, 64), (256, 128), (512, 128), (128, 32)])
def test_perfect_reconstruction(rng, win, hop):
    t = 8 * win
    x = rng.standard_normal(t).astype(np.float32) * 0.5
    spec = stft(jnp.asarray(x), win, hop)
    y = np.asarray(istft(spec, win, hop, length=t))
    # Edges lack full overlap; check the interior.
    sl = slice(win, t - win)
    np.testing.assert_allclose(y[sl], x[sl], atol=1e-4)


def test_reconstruction_batched(rng):
    x = rng.standard_normal((2, 3, 1024)).astype(np.float32)
    spec = stft(jnp.asarray(x), 256, 64)
    y = np.asarray(istft(spec, 256, 64, length=1024))
    np.testing.assert_allclose(y[..., 256:-256], x[..., 256:-256], atol=1e-4)
