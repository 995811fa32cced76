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


def bootstrap_ci(
    vals: np.ndarray, n_boot: int = 10000, seed: int = 0, level: float = 95.0
) -> dict:
    """Bootstrap CI of the mean over per-utterance scores: resample the
    utterance set with replacement n_boot times.  Returns mean / lo / hi /
    std-error — quality claims must carry these (an n=32 mean alone cannot
    resolve sub-dB differences)."""
    v = np.asarray(vals, np.float64)
    rng = np.random.default_rng(seed)
    means = rng.choice(v, size=(n_boot, len(v)), replace=True).mean(axis=1)
    lo, hi = np.percentile(means, [(100 - level) / 2, 100 - (100 - level) / 2])
    return {
        "mean": float(v.mean()),
        "ci_lo": float(lo),
        "ci_hi": float(hi),
        "stderr": float(v.std(ddof=1) / np.sqrt(len(v))),
        "n": int(len(v)),
    }


def evaluate_separation(
    est: np.ndarray,  # [B, S, T]
    ref: np.ndarray,  # [B, S, T]
    mix: np.ndarray,  # [B, T]
    bss: bool = True,
    per_utt: bool = False,
    with_stoi: bool = False,
    sample_rate: int = 8000,
) -> dict:
    """Aggregate separation quality: mean SI-SDR/SI-SDRi (device) plus the
    first-party BSS-Eval SDR/SIR/SAR columns (ops/bss_eval.py — the
    reference's mir_eval headline metric, SURVEY.md §2.6) and the optional
    mir_eval cross-check when that package exists.  ``per_utt=True`` adds
    per-utterance SI-SDRi (and SDRi) lists plus bootstrap 95% CIs."""
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
    if per_utt:
        si_sdri_utt = np.asarray(sep_scores - base, np.float64)
        out["si_sdri_ci"] = bootstrap_ci(si_sdri_utt)
        out["si_sdri_per_utt"] = [round(float(v), 3) for v in si_sdri_utt]
    if bss:
        from amss_tpu.ops.bss_eval import bss_eval_batch

        out.update(bss_eval_batch(np.asarray(ref), np.asarray(est)))
        # SDRi against the mixture under the same 512-tap decomposition
        mix_s = np.broadcast_to(np.asarray(mix)[:, None, :], ref.shape)
        out["sdr_mix"] = bss_eval_batch(np.asarray(ref), mix_s)["sdr"]
        out["sdri"] = out["sdr"] - out["sdr_mix"]
        if per_utt:
            per_sdr = bss_eval_batch(np.asarray(ref), np.asarray(est), per_utt=True)
            per_mix = bss_eval_batch(np.asarray(ref), mix_s, per_utt=True)
            sdri_utt = np.asarray(per_sdr["sdr_per_utt"]) - np.asarray(
                per_mix["sdr_per_utt"]
            )
            out["sdri_ci"] = bootstrap_ci(sdri_utt)
            out["sdri_per_utt"] = [round(float(v), 3) for v in sdri_utt]
    if with_stoi:
        # intelligibility companion metric (first-party, ops/stoi.py) over
        # PIT-aligned estimates; mean over utterances and speakers, plus the
        # mixture baseline for the improvement column
        from amss_tpu.ops.stoi import stoi

        aligned = np.asarray(permute_estimates(est_j, perm))
        ref_np, mix_np = np.asarray(ref), np.asarray(mix)
        vals, base_vals = [], []
        for b in range(ref_np.shape[0]):
            for s in range(ref_np.shape[1]):
                vals.append(stoi(ref_np[b, s], aligned[b, s], sample_rate))
                base_vals.append(stoi(ref_np[b, s], mix_np[b], sample_rate))
        out["stoi"] = float(np.mean(vals))
        out["stoi_mix"] = float(np.mean(base_vals))
        out["stoi_i"] = out["stoi"] - out["stoi_mix"]
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
