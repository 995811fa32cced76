"""Separation metrics, fully on device.

Capability parity: the reference scored with host-side
mir_eval.separation.bss_eval_sources (SURVEY.md §2.6).  Here the headline
metrics (SI-SDR, SDRi, permutation-invariant assignment) are jnp so evaluation
rides the same jit program as inference; a host mir_eval cross-check harness
lives in amss_tpu/infer/evaluate.py for parity audits.

Permutations over S speakers are enumerated statically (S is 2-4), so the
best-permutation search is a stack + max — no data-dependent control flow.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp

_EPS = 1e-8


def si_sdr(est: jnp.ndarray, ref: jnp.ndarray, zero_mean: bool = True) -> jnp.ndarray:
    """Scale-invariant SDR in dB.  est/ref: ``[..., T]`` -> ``[...]``."""
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True)
    proj = dot / (energy + _EPS) * ref
    noise = est - proj
    ratio = jnp.sum(proj * proj, axis=-1) / (jnp.sum(noise * noise, axis=-1) + _EPS)
    return 10.0 * jnp.log10(ratio + _EPS)


def pit_si_sdr(est: jnp.ndarray, ref: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation-invariant SI-SDR.

    est, ref: ``[..., S, T]``.  Returns (best mean-over-sources SI-SDR ``[...]``,
    best permutation index ``[...]`` into itertools.permutations(range(S))).
    """
    s = est.shape[-2]
    perms = list(itertools.permutations(range(s)))
    scores = []
    for perm in perms:
        permuted = est[..., jnp.array(perm), :]
        scores.append(jnp.mean(si_sdr(permuted, ref), axis=-1))
    stacked = jnp.stack(scores, axis=-1)  # [..., n_perms]
    best = jnp.argmax(stacked, axis=-1)
    return jnp.max(stacked, axis=-1), best


def permute_estimates(est: jnp.ndarray, perm_idx: jnp.ndarray) -> jnp.ndarray:
    """Reorder ``est[..., S, T]`` by the permutation index from pit_si_sdr."""
    s = est.shape[-2]
    perms = jnp.array(list(itertools.permutations(range(s))))  # [n_perms, S]
    chosen = perms[perm_idx]  # [..., S]
    return jnp.take_along_axis(est, chosen[..., None], axis=-2)


def sdr_improvement(
    est: jnp.ndarray, ref: jnp.ndarray, mix: jnp.ndarray
) -> jnp.ndarray:
    """SI-SDR improvement over the unprocessed mixture (the WSJ0-2mix headline).

    est/ref: ``[..., S, T]``; mix: ``[..., T]``.  Returns ``[...]`` in dB.
    """
    sep, _ = pit_si_sdr(est, ref)
    mix_rep = jnp.broadcast_to(mix[..., None, :], ref.shape)
    base = jnp.mean(si_sdr(mix_rep, ref), axis=-1)
    return sep - base
