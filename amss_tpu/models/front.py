"""Analysis-synthesis front-ends and mask/target helpers.

Capability parity: the reference's two interchangeable fronts (SURVEY.md §1
L2): fixed STFT/iSTFT vs the learned adaptive filterbank (models/adapt.py
here).  The separator is front-agnostic through this protocol:

    encode(params, wave[..., T]) -> (codes[..., T', F] nonneg, aux)
    features(params, codes)      -> log-compressed separator input
    decode(params, codes, aux, length) -> wave[..., T]

``codes`` is the magnitude-like representation masks multiply; ``aux`` carries
whatever synthesis needs (STFT: mixture phase; adapt: sign + argmax indices).
Masking with the mixture phase is the classic DPCL resynthesis (SURVEY.md
§3.4).
"""

from __future__ import annotations

import jax.numpy as jnp

from amss_tpu.ops.stft import stft, istft
from amss_tpu.utils.config import FrontConfig

_EPS = 1e-7


class STFTFrontEnd:
    """Fixed windowed-DFT analysis/synthesis (zero parameters)."""

    def __init__(self, cfg: FrontConfig):
        assert cfg.kind == "stft"
        self.cfg = cfg

    def init(self, key) -> dict:
        return {}

    def encode(self, params: dict, wave: jnp.ndarray):
        spec = stft(wave, self.cfg.win, self.cfg.hop)
        mag = jnp.abs(spec)
        phase = spec / (mag + _EPS)
        return mag, {"phase": phase}

    def features(self, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
        return jnp.log(codes + _EPS)

    def decode(self, params: dict, codes: jnp.ndarray, aux: dict, length: int):
        spec = codes.astype(jnp.complex64) * aux["phase"]
        return istft(spec, self.cfg.win, self.cfg.hop, length=length)


# ---------------------------------------------------------------------------
# Mask / target builders shared by all separators (SURVEY.md §2.1 last row).
# ---------------------------------------------------------------------------


def ideal_binary_mask(src_codes: jnp.ndarray) -> jnp.ndarray:
    """Dominant-source one-hot mask.  src_codes [B, S, T', F] -> Y [B, T', F, S].

    First-max tie-break (argmax), matching the pooling convention.
    """
    s = src_codes.shape[1]
    dom = jnp.argmax(src_codes, axis=1)  # [B, T', F]
    return _one_hot_last(dom, s, src_codes.dtype)


def _one_hot_last(idx: jnp.ndarray, depth: int, dtype) -> jnp.ndarray:
    iota = jnp.arange(depth, dtype=idx.dtype)
    return (idx[..., None] == iota).astype(dtype)


def vad_weights(
    mix_codes: jnp.ndarray, threshold_db: float = 40.0
) -> jnp.ndarray:
    """Binary voice-activity weights: drop bins > threshold_db below the
    utterance max (classic DPCL silence weighting).  [B, T', F] -> [B, T', F].
    """
    logmag = 20.0 * jnp.log10(mix_codes + _EPS)
    ref = jnp.max(logmag, axis=(-2, -1), keepdims=True)
    return (logmag > ref - threshold_db).astype(mix_codes.dtype)


def instance_norm(
    feats: jnp.ndarray, frame_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-utterance zero-mean/unit-var over (time, freq), padding-aware."""
    if frame_mask is None:
        mu = jnp.mean(feats, axis=(-2, -1), keepdims=True)
        var = jnp.var(feats, axis=(-2, -1), keepdims=True)
    else:
        m = frame_mask[..., None]
        denom = jnp.maximum(
            jnp.sum(m * jnp.ones_like(feats), axis=(-2, -1), keepdims=True), 1.0
        )
        mu = jnp.sum(feats * m, axis=(-2, -1), keepdims=True) / denom
        var = jnp.sum(m * (feats - mu) ** 2, axis=(-2, -1), keepdims=True) / denom
    return (feats - mu) * jax_rsqrt(var + 1e-5)


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def make_front(cfg: FrontConfig):
    if cfg.kind == "stft":
        return STFTFrontEnd(cfg)
    if cfg.kind == "adapt":
        from amss_tpu.models.adapt import AdaptFrontEnd

        return AdaptFrontEnd(cfg)
    raise ValueError(f"unknown front kind {cfg.kind!r}")
