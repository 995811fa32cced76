"""Learned adaptive filterbank front-end ("Adapt").

Capability parity: the reference's models/adapt.py — conv1d analysis ->
|.| nonlinearity -> max-pool-with-argmax -> learned smoothing, and the mirror
synthesis path unpool -> transposed conv1d -> waveform (SURVEY.md §2.2), after
Venkataramani & Smaragdis 2017 (SURVEY.md §2.9).

TPU-first design: a stride-s conv1d with kernel length L IS ``frames @ W``
with framing (L, s) — the exact same layout-then-MXU-matmul shape as the STFT
front, so encoder and decoder both ride the MXU and share the framing/OLA
primitives (and later the fused Pallas kernel).  The transposed conv is
``codes @ W_dec`` followed by overlap-add — adjoint of framing, no scatter.

Representation contract (models/front.py protocol):
  codes  [B, T'', N]  nonneg pooled magnitudes (what masks multiply)
  aux    sign [B, T', N] (pre-|.| sign at full frame rate) + argmax idx
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.ops.framing import frame_signal, overlap_add
from amss_tpu.ops.pallas.dispatch import use_pallas
from amss_tpu.ops.pallas.framed_matmul import framed_matmul
from amss_tpu.ops.pallas.ola import pallas_decode_ola
from amss_tpu.ops.pooling import max_pool_argmax, unpool_argmax
from amss_tpu.utils.config import FrontConfig

_EPS = 1e-7


class AdaptFrontEnd:
    """Learned conv1d analysis/synthesis filterbank."""

    def __init__(self, cfg: FrontConfig):
        assert cfg.kind == "adapt"
        self.cfg = cfg

    def init(self, key) -> dict:
        c = self.cfg
        k_enc, k_dec, k_sm = jax.random.split(key, 3)
        # Gabor-ish init: random phase sinusoids windowed by Hann — converges
        # much faster than pure noise while remaining fully learnable.
        n = np.arange(c.filter_len)
        window = 0.5 - 0.5 * np.cos(2 * np.pi * n / c.filter_len)
        freqs = np.linspace(0.02, 0.98, c.n_filters) * np.pi
        phases = np.random.default_rng(0).uniform(0, 2 * np.pi, c.n_filters)
        bank = window[None, :] * np.cos(freqs[:, None] * n[None, :] + phases[:, None])
        bank = (bank / np.linalg.norm(bank, axis=1, keepdims=True)).astype(np.float32)
        noise_e = 0.05 * jax.random.normal(k_enc, (c.n_filters, c.filter_len))
        noise_d = 0.05 * jax.random.normal(k_dec, (c.n_filters, c.filter_len))
        return {
            "enc": jnp.asarray(bank.T) + noise_e.T,  # [L, N]
            "dec": jnp.asarray(bank) + noise_d,  # [N, L]
            "smooth": jax.random.normal(k_sm, (c.smooth_len, 1)) * 0.1 + 1.0 / c.smooth_len,
        }

    # -- analysis -----------------------------------------------------------
    def encode(self, params: dict, wave: jnp.ndarray):
        c = self.cfg
        if use_pallas():
            lead = wave.shape[:-1]
            flat = wave.reshape(-1, wave.shape[-1])
            z = framed_matmul(flat, params["enc"], c.stride)
            z = z.reshape(*lead, *z.shape[1:])
        else:
            frames = frame_signal(wave, c.filter_len, c.stride)  # [..., T', L]
            z = jnp.matmul(frames, params["enc"], preferred_element_type=jnp.float32, precision="highest")
        mag = jnp.abs(z)  # [..., T', N]
        sign = jnp.sign(z)
        # Trim T' to a multiple of pool (static).
        tprime = mag.shape[-2]
        keep = (tprime // c.pool) * c.pool
        mag = mag[..., :keep, :]
        sign = sign[..., :keep, :]
        codes, idx = max_pool_argmax(mag, c.pool)  # [..., T'', N]
        return codes, {"sign": sign, "idx": idx, "t_frames": keep}

    def features(self, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
        """Log-compressed, temporally smoothed codes (the learned 'spectrogram').

        The learned smoothing conv is causal depthwise over time (shared
        across filters), the reference's envelope layer (SURVEY.md §2.2).
        """
        k = params["smooth"][:, 0]  # [smooth_len]
        klen = k.shape[0]
        pads = [(0, 0)] * (codes.ndim - 2) + [(klen - 1, 0), (0, 0)]
        padded = jnp.pad(codes, pads)
        # Causal depthwise conv over time: sum of shifted views (klen is tiny).
        out = jnp.zeros_like(codes)
        t = codes.shape[-2]
        for i in range(klen):
            out = out + k[i] * padded[..., i : i + t, :]
        return jnp.log(jnp.maximum(out, 0.0) + _EPS)

    # -- synthesis ----------------------------------------------------------
    def decode(self, params: dict, codes: jnp.ndarray, aux: dict, length: int):
        c = self.cfg
        up = unpool_argmax(codes, aux["idx"], c.pool)  # [..., T', N]
        z = up * aux["sign"]
        if use_pallas():
            lead = z.shape[:-2]
            y = pallas_decode_ola(
                z.reshape(-1, *z.shape[-2:]), params["dec"], c.stride, length=length
            )
            return y.reshape(*lead, length)
        frames = jnp.matmul(z, params["dec"], preferred_element_type=jnp.float32, precision="highest")
        return overlap_add(frames, c.stride, length=length)


class AdaptAutoencoder:
    """Reconstruction pretraining of the adaptive front (SURVEY.md §2.2 last
    row, §3.1): clean-speech autoencoding with an SDR-flavored loss, the
    prerequisite of the end-to-end finetune recipe (BASELINE.json:8)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.front = AdaptFrontEnd(cfg.front)

    def init(self, key) -> dict:
        return {"front": self.front.init(key)}

    def loss(self, params: dict, sources: jnp.ndarray):
        """sources [B, S, T]: each clean chunk autoencodes independently."""
        from amss_tpu.ops.metrics import si_sdr

        b, s, t = sources.shape
        wave = sources.reshape(b * s, t)
        codes, aux = self.front.encode(params["front"], wave)
        recon = self.front.decode(params["front"], codes, aux, t)
        neg_si = -jnp.mean(si_sdr(recon, wave))
        l2 = jnp.mean((recon - wave) ** 2)
        l = neg_si + 10.0 * l2
        return l, {"ae_loss": l, "neg_si_sdr": neg_si, "l2": l2}

    def loss_from_batch(self, params, batch, rng=None):
        return self.loss(params, batch["sources"])
