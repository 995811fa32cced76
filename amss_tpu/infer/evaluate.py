"""Evaluation harness: SDRi / SI-SDR over held-out mixtures + WAV export.

Capability parity: the reference's eval scripts (SURVEY.md §2.6, §3.4) which
scored with host mir_eval.bss_eval_sources.  Here the headline SI-SDRi is
computed on device (ops/metrics.py); if mir_eval happens to be importable a
cross-check column is emitted (it is NOT in this image — gated import), since
metric parity is part of the north star (BASELINE.json:2).
"""

from __future__ import annotations

import os
import wave as wave_mod

import jax.numpy as jnp
import numpy as np

from amss_tpu.ops.metrics import pit_si_sdr, permute_estimates, si_sdr


def evaluate_separation(
    est: np.ndarray,  # [B, S, T]
    ref: np.ndarray,  # [B, S, T]
    mix: np.ndarray,  # [B, T]
    bss: bool = True,
) -> dict:
    """Aggregate separation quality: mean SI-SDR/SI-SDRi (device) plus the
    first-party BSS-Eval SDR/SIR/SAR columns (ops/bss_eval.py — the
    reference's mir_eval headline metric, SURVEY.md §2.6) and the optional
    mir_eval cross-check when that package exists."""
    est_j, ref_j, mix_j = jnp.asarray(est), jnp.asarray(ref), jnp.asarray(mix)
    sep_scores, perm = pit_si_sdr(est_j, ref_j)
    mix_rep = jnp.broadcast_to(mix_j[..., None, :], ref_j.shape)
    base = jnp.mean(si_sdr(mix_rep, ref_j), axis=-1)
    out = {
        "si_sdr": float(jnp.mean(sep_scores)),
        "si_sdr_mix": float(jnp.mean(base)),
        "si_sdri": float(jnp.mean(sep_scores - base)),
        "n": int(est.shape[0]),
    }
    if bss:
        from amss_tpu.ops.bss_eval import bss_eval_batch

        out.update(bss_eval_batch(np.asarray(ref), np.asarray(est)))
        # SDRi against the mixture under the same 512-tap decomposition
        mix_s = np.broadcast_to(np.asarray(mix)[:, None, :], ref.shape)
        out["sdr_mix"] = bss_eval_batch(np.asarray(ref), mix_s)["sdr"]
        out["sdri"] = out["sdr"] - out["sdr_mix"]
    try:  # host cross-check harness (SURVEY.md §2.6); not present in image
        import mir_eval.separation as mes

        aligned = np.asarray(permute_estimates(est_j, perm))
        sdrs = []
        for b in range(est.shape[0]):
            sdr, _, _, _ = mes.bss_eval_sources(ref[b], aligned[b], compute_permutation=False)
            sdrs.append(sdr.mean())
        out["mir_eval_sdr"] = float(np.mean(sdrs))
    except ImportError:
        pass
    return out


def write_wav(path: str, x: np.ndarray, sample_rate: int = 8000):
    """16-bit PCM WAV export (reference wrote separated estimates as WAVs)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    x = np.clip(x, -1.0, 1.0)
    pcm = np.round(x * 32767.0).astype(np.int16)
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
