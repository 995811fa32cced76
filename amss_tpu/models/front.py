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

import numpy as np

from amss_tpu.ops.framing import overlap_add
from amss_tpu.ops.pallas.dispatch import use_pallas
from amss_tpu.ops.pallas.framed_matmul import pallas_stft_ri
from amss_tpu.ops.pallas.ola import pallas_decode_ola
from amss_tpu.ops.stft import stft_ri, istft_ri, idft_matrices, hann_window
from amss_tpu.utils.config import FrontConfig

_EPS = 1e-7


def _pallas_istft(ri: jnp.ndarray, win: int, hop: int, length: int) -> jnp.ndarray:
    """iSTFT via the fused decode+OLA kernel: ``[B', NF, 2F] -> [B', length]``.

    The synthesis window folds into the inverse-DFT basis columns; the COLA
    normalizer is data-independent, so XLA constant-folds it.
    """
    window = hann_window(win)
    ci, si = idft_matrices(win)
    basis = jnp.asarray(np.concatenate([ci, si], axis=0) * window[None, :])
    y = pallas_decode_ola(ri, basis, hop, length=length)
    nf = ri.shape[-2]
    wsq = np.tile((window * window)[None, :], (nf, 1))
    norm = overlap_add(jnp.asarray(wsq), hop, length=length)
    # Relative clamp: see ops/stft.istft_ri — edge norms ~0 would blow up
    # masked (inconsistent) spectra.
    floor = 1e-2 * jnp.max(norm)
    return y / jnp.maximum(norm, floor)


class STFTFrontEnd:
    """Fixed windowed-DFT analysis/synthesis (zero parameters).

    Phase rides in ``aux`` as unit (cos, sin) real tensors — the axon TPU
    backend has no complex dtype, and real pairs fuse better anyway.
    """

    def __init__(self, cfg: FrontConfig):
        assert cfg.kind == "stft"
        self.cfg = cfg

    def init(self, key) -> dict:
        return {}

    def encode(self, params: dict, wave: jnp.ndarray):
        c = self.cfg
        if use_pallas() and wave.ndim == 2:
            re, im = pallas_stft_ri(wave, c.win, c.hop)
        elif use_pallas() and wave.ndim == 3:  # [B, S, T] source batches
            b, s, t = wave.shape
            re, im = pallas_stft_ri(wave.reshape(b * s, t), c.win, c.hop)
            re = re.reshape(b, s, *re.shape[1:])
            im = im.reshape(b, s, *im.shape[1:])
        else:
            re, im = stft_ri(wave, c.win, c.hop)
        mag = jnp.sqrt(re * re + im * im + _EPS * _EPS)
        return mag, {"cos": re / mag, "sin": im / mag}

    def features(self, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
        return jnp.log(codes + _EPS)

    def decode(self, params: dict, codes: jnp.ndarray, aux: dict, length: int):
        re = codes * aux["cos"]
        im = codes * aux["sin"]
        c = self.cfg
        if use_pallas() and codes.ndim >= 3:
            lead = codes.shape[:-2]
            nf, f = codes.shape[-2:]
            ri = jnp.concatenate([re, im], axis=-1).reshape(-1, nf, 2 * f)
            y = _pallas_istft(ri, c.win, c.hop, length)
            return y.reshape(*lead, length)
        return istft_ri(re, im, c.win, c.hop, length=length)


# ---------------------------------------------------------------------------
# Mask / target builders shared by all separators (SURVEY.md §2.1 last row).
# ---------------------------------------------------------------------------


def corrupt_mix(
    mix: jnp.ndarray,  # [B, T]
    rng,
    snr_db_range: tuple[float, float],
) -> jnp.ndarray:
    """Training-time noise injection (beyond-reference, WHAM!-style noisy
    separation): add white Gaussian noise at a per-utterance SNR drawn
    uniformly from ``snr_db_range`` against the mixture's RMS.  In-graph —
    no data-pipeline changes, deterministic in (seed, step) like dropout
    (the caller folds its step rng).  Targets stay the CLEAN sources; only
    the observed mixture is corrupted."""
    import jax

    lo, hi = snr_db_range
    kn, ks = jax.random.split(jax.random.fold_in(rng, 0x5E15E))
    b = mix.shape[0]
    snr_db = jax.random.uniform(ks, (b,), minval=lo, maxval=hi)
    noise = jax.random.normal(kn, mix.shape, mix.dtype)
    mix_rms = jnp.sqrt(jnp.mean(mix**2, axis=-1) + _EPS)
    noise_rms = jnp.sqrt(jnp.mean(noise**2, axis=-1) + _EPS)
    target_rms = mix_rms * 10.0 ** (-snr_db / 20.0)
    return mix + noise * (target_rms / noise_rms)[:, None]


def drop_sources(
    sources: jnp.ndarray,  # [B, S, T]
    rng,
    min_speakers: int,
) -> jnp.ndarray:
    """Count-diverse training (beyond reference — the reference fixes
    nb_speakers per experiment, SURVEY.md §2.3): draw a per-sample active
    speaker count k ~ U{min_speakers..S} and zero sources with index >= k,
    in-graph.  Zeroed sources receive (almost) no bins in the ideal binary
    mask and VAD weights kill all-silent bins, so the clustering objective
    (DPCL/Chimera DC head) trains the embedding geometry to form a VARIABLE
    number of clusters — the property blind speaker counting
    (infer/count.py eigengap) needs.  Speaker order inside a batch row is
    already a uniform draw (data/mixer.py plan), so zeroing the TAIL indexes
    is an unbiased subset draw.  Deterministic in (seed, step) like dropout."""
    import jax

    b, s, _ = sources.shape
    k = jax.random.randint(
        jax.random.fold_in(rng, 0xC0_DE7), (b,), min_speakers, s + 1
    )
    active = (jnp.arange(s)[None, :] < k[:, None]).astype(sources.dtype)
    return sources * active[:, :, None]


def reverberate_sources(
    sources: jnp.ndarray,  # [B, S, T]
    rng,
    rt60_range: tuple[float, float],  # in SAMPLES (e.g. (800, 3200) @ 8 kHz)
    drr_db_range: tuple[float, float] = (0.0, 10.0),
    rir_len: int | None = None,
) -> jnp.ndarray:
    """Training-time reverberation (beyond-reference, WHAMR-style): convolve
    each source with its OWN synthetic room impulse response — unit direct
    path at lag 0 plus an exponentially-decaying Gaussian tail whose -60 dB
    point (RT60, drawn uniformly per source in ``rt60_range`` samples) sets
    the decay and whose energy is scaled to a drawn direct-to-reverb ratio
    (``drr_db_range``).  The caller sums the result into the observed mixture;
    targets stay the DRY sources, so the model learns joint
    dereverberation + separation.  In-graph and deterministic in (seed, step)
    like `corrupt_mix`; the convolution is one depthwise `lax.conv` (B·S
    groups), static shapes throughout."""
    import jax

    b, s, t = sources.shape
    lo, hi = rt60_range
    if rir_len is None:
        # tail cut at the -30 dB point of the longest draw (later taps are
        # inaudible under the drawn DRRs); capped for conv cost and by T
        rir_len = int(min(t, 4096, max(2, int(hi) // 2)))
    kt, kd, kn = jax.random.split(jax.random.fold_in(rng, 0x4EE4B), 3)
    rt60 = jax.random.uniform(kt, (b, s, 1), minval=lo, maxval=hi)
    drr_db = jax.random.uniform(
        kd, (b, s, 1), minval=drr_db_range[0], maxval=drr_db_range[1]
    )
    n = jnp.arange(1, rir_len, dtype=sources.dtype)[None, None, :]
    decay = 10.0 ** (-3.0 * n / rt60)  # amplitude: -60 dB at lag rt60
    tail = jax.random.normal(kn, (b, s, rir_len - 1), sources.dtype) * decay
    tail_energy = jnp.sum(tail**2, axis=-1, keepdims=True)
    # direct-path energy is 1; scale the tail so direct/reverb == drawn DRR
    tail = tail * jnp.sqrt(10.0 ** (-drr_db / 10.0) / (tail_energy + _EPS))
    h = jnp.concatenate([jnp.ones((b, s, 1), sources.dtype), tail], axis=-1)
    h = h / jnp.sqrt(jnp.sum(h**2, axis=-1, keepdims=True))  # unit energy
    # causal convolution y[t] = sum_m h[m] x[t-m] as a depthwise correlation
    # with the kernel flipped and full left padding
    x = sources.reshape(1, b * s, t)
    w = jnp.flip(h, axis=-1).reshape(b * s, 1, rir_len)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(rir_len - 1, 0)],
        feature_group_count=b * s,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y.reshape(b, s, t).astype(sources.dtype)


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


def psa_targets(
    mix_codes: jnp.ndarray,  # [B, T', F] mixture magnitudes
    mix_aux: dict,  # {"cos","sin"} mixture unit phase
    src_codes: jnp.ndarray,  # [B, S, T', F] source magnitudes
    src_aux: dict,  # {"cos","sin"} source unit phase
) -> jnp.ndarray:
    """Truncated phase-sensitive approximation targets (Erdogan et al. 2015;
    Chimera++ per SURVEY.md §2.3/§2.9): t_s = |S_s|·cos(φ_s − φ_mix), clipped
    to [0, |X|].  Masks trained toward these compensate for the phase error of
    mixture-phase resynthesis — exactly what magnitude-only (MSA) losses are
    blind to.  -> [B, S, T', F] (same layout as src_codes)."""
    cosd = (
        src_aux["cos"] * mix_aux["cos"][:, None]
        + src_aux["sin"] * mix_aux["sin"][:, None]
    )
    t = src_codes * cosd
    return jnp.clip(t, 0.0, mix_codes[:, None])


def vad_weights(
    mix_codes: jnp.ndarray, threshold_db: float = 40.0
) -> jnp.ndarray:
    """Binary voice-activity weights: drop bins > threshold_db below the
    utterance max (classic DPCL silence weighting).  [B, T', F] -> [B, T', F].
    """
    logmag = 20.0 * jnp.log10(mix_codes + _EPS)
    ref = jnp.max(logmag, axis=(-2, -1), keepdims=True)
    return (logmag > ref - threshold_db).astype(mix_codes.dtype)


def magnitude_weights(mix_codes: jnp.ndarray) -> jnp.ndarray:
    """Magnitude-ratio bin weights (DPCL+/Chimera++ style): w ∝ |X|,
    normalized to mean 1 per utterance so loss scales match vad weighting."""
    mean = jnp.mean(mix_codes, axis=(-2, -1), keepdims=True)
    return mix_codes / jnp.maximum(mean, _EPS)


def bin_weights(mix_codes: jnp.ndarray, kind: str, threshold_db: float) -> jnp.ndarray:
    if kind == "vad":
        return vad_weights(mix_codes, threshold_db)
    if kind == "magnitude":
        return magnitude_weights(mix_codes)
    if kind == "magvad":  # magnitude-ratio gated by the VAD threshold
        return magnitude_weights(mix_codes) * vad_weights(mix_codes, threshold_db)
    raise ValueError(f"unknown weight_kind {kind!r}")


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


def channel_norm(
    feats: jnp.ndarray, frame_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-CHANNEL zero-mean/unit-var over time (padding-aware).  For learned
    filterbanks whose per-filter output scales are arbitrary — a global
    instance norm lets loud filters dominate the trunk input (the round-1
    'per-filter code norm' lever for adaptive-front parity, NOTES_r1.md)."""
    if frame_mask is None:
        mu = jnp.mean(feats, axis=-2, keepdims=True)
        var = jnp.var(feats, axis=-2, keepdims=True)
    else:
        m = frame_mask[..., None]
        denom = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        mu = jnp.sum(feats * m, axis=-2, keepdims=True) / denom
        var = jnp.sum(m * (feats - mu) ** 2, axis=-2, keepdims=True) / denom
    return (feats - mu) * jax_rsqrt(var + 1e-5)


def cumulative_norm(
    feats: jnp.ndarray,  # [..., T', F]
    frame_mask: jnp.ndarray | None = None,  # [..., T'] 1=valid
    carry: tuple | None = None,  # (count, sum, sumsq) stats of frames BEFORE t=0
) -> tuple[jnp.ndarray, tuple]:
    """Causal utterance norm: frame t is normalized by the running mean/var of
    all valid frames <= t (cumulative layer norm, Conv-TasNet causal mode).

    Unlike instance_norm nothing here reads the future, so it is the input
    norm for the streaming path (infer/realtime.py): `carry` seeds the
    running stats with everything that already streamed past, making
    block-streaming outputs EXACTLY equal full-utterance outputs (the carry
    accumulates in the same order the offline cumsum would).

    Precision envelope of the (count, sum, sumsq) float32 carry: the running
    sums stop registering new frames only after ~2^24 pushes (months of
    audio), and the ss/n - mu^2 cancellation costs ~(mu^2/var)*2^-24 relative
    variance error — negligible for log-compressed features whose mu^2/var is
    O(1..100).  For unbounded multi-day streams use cumulative_norm_welford,
    whose merge is cancellation-free (at the cost of bit-exactness vs the
    offline cumsum path).

    Returns (normalized feats, (count, sum, sumsq) totals over all frames)."""
    f = feats.shape[-1]
    if frame_mask is None:
        valid = jnp.ones(feats.shape[:-1], feats.dtype)
    else:
        valid = frame_mask.astype(feats.dtype)
    x = feats * valid[..., None]
    cnt = jnp.cumsum(valid, axis=-1) * f  # [..., T'] scalars-per-frame
    s = jnp.cumsum(jnp.sum(x, axis=-1), axis=-1)
    ss = jnp.cumsum(jnp.sum(x * x, axis=-1), axis=-1)
    if carry is not None:
        c0, s0, ss0 = (jnp.asarray(v)[..., None] for v in carry)
        cnt, s, ss = cnt + c0, s + s0, ss + ss0
    denom = jnp.maximum(cnt, 1.0)
    mu = s / denom
    var = jnp.maximum(ss / denom - mu * mu, 0.0)
    out = (feats - mu[..., None]) * jax_rsqrt(var[..., None] + 1e-5)
    if frame_mask is not None:
        out = out * valid[..., None]
    totals = (cnt[..., -1], s[..., -1], ss[..., -1])
    return out, totals


def cumulative_norm_welford(
    feats: jnp.ndarray,  # [..., T', F]
    frame_mask: jnp.ndarray | None = None,  # [..., T'] 1=valid
    carry: tuple | None = None,  # (count, mean, M2) of frames BEFORE t=0
) -> tuple[jnp.ndarray, tuple]:
    """cumulative_norm with a (count, mean, M2) carry merged by Chan's
    parallel-Welford formula — no large-sum cancellation, so the carry stays
    accurate over unbounded streams (the infinite push(end_frame=None) case;
    advisor r2 finding on amss_tpu/models/front.py).  Within one push the
    prefix stats come from cumsum (windows are short, f32 is plenty); only
    the across-push merge uses the stable form.  Agrees with cumulative_norm
    to fp noise, NOT bit-exactly — the default streaming path keeps the sums
    carry for its offline-exactness contract."""
    f = feats.shape[-1]
    if frame_mask is None:
        valid = jnp.ones(feats.shape[:-1], feats.dtype)
    else:
        valid = frame_mask.astype(feats.dtype)
    x = feats * valid[..., None]
    cnt = jnp.cumsum(valid, axis=-1) * f  # [..., T'] local prefix counts
    s = jnp.cumsum(jnp.sum(x, axis=-1), axis=-1)
    ss = jnp.cumsum(jnp.sum(x * x, axis=-1), axis=-1)
    d_loc = jnp.maximum(cnt, 1.0)
    mu_loc = s / d_loc
    m2_loc = jnp.maximum(ss - cnt * mu_loc * mu_loc, 0.0)
    if carry is None:
        n0 = jnp.zeros(feats.shape[:-2], feats.dtype)
        mu0 = jnp.zeros_like(n0)
        m20 = jnp.zeros_like(n0)
    else:
        n0, mu0, m20 = carry
    n0_, mu0_, m20_ = n0[..., None], mu0[..., None], m20[..., None]
    n = n0_ + cnt
    dn = jnp.maximum(n, 1.0)
    delta = mu_loc - mu0_
    mu = mu0_ + delta * cnt / dn
    m2 = m20_ + m2_loc + delta * delta * n0_ * cnt / dn
    var = jnp.maximum(m2 / dn, 0.0)
    out = (feats - mu[..., None]) * jax_rsqrt(var[..., None] + 1e-5)
    if frame_mask is not None:
        out = out * valid[..., None]
    totals = (n[..., -1], mu[..., -1], m2[..., -1])
    return out, totals


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def make_front(cfg: FrontConfig):
    if cfg.kind == "stft":
        return STFTFrontEnd(cfg)
    if cfg.kind == "adapt":
        from amss_tpu.models.adapt import AdaptFrontEnd

        return AdaptFrontEnd(cfg)
    raise ValueError(f"unknown front kind {cfg.kind!r}")
