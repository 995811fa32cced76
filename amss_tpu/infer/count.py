"""Blind speaker-count estimation from deep-clustering embeddings.

Beyond-reference capability (the reference fixed nb_speakers per experiment,
SURVEY.md §2.3): DPCL-style embeddings carry the speaker count in their
spectrum.  For ideal embeddings the weighted affinity VV^T is block-diagonal
with one block per speaker, so the E x E weighted Gram
G = V^T diag(w) V / sum(w) has exactly k significant eigenvalues (each about
that cluster's weight share) and the rest near zero.  We therefore estimate k
as the largest RELATIVE eigengap of G's descending spectrum — the standard
spectral-clustering heuristic (von Luxburg 2007), here on the E x E Gram
(E ~ 20) instead of the (T'F)^2 affinity, so it is tiny and fully on-device:
one einsum (MXU) + one 20x20 eigh per utterance.

Usage: `count_speakers(model, params, mix)` for models with an embedding head
(DPCL via .embed, Chimera via its DC head); `eigengap_counts` for raw
embeddings.  The CLI wires this as `separate --num-speakers auto`, grouping
utterances by the estimate and clustering each group with its own k.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def eigengap_counts(
    v: jnp.ndarray,  # [B, N, E] unit-norm embeddings (flattened TF bins)
    w: jnp.ndarray,  # [B, N] nonneg bin weights (0 = ignore)
    k_max: int = 4,
) -> jnp.ndarray:
    """Per-utterance speaker-count estimate in [1, k_max] (int32 [B]).

    k = argmax_{j<=k_max} (lam_j - lam_{j+1}) / lam_j over the descending
    eigenvalues of the weighted embedding Gram.  Needs E >= k_max + 1.
    """
    e = v.shape[-1]
    if e < k_max + 1:
        raise ValueError(f"k_max={k_max} needs embed_dim >= {k_max + 1}, got {e}")
    vw = v * w[..., None]
    g = jnp.einsum("bne,bnf->bef", vw, v, preferred_element_type=jnp.float32)
    g = g / jnp.maximum(jnp.sum(w, axis=-1), _EPS)[:, None, None]
    g = 0.5 * (g + jnp.swapaxes(g, -1, -2))  # exact symmetry for eigh
    lam = jnp.linalg.eigh(g)[0][..., ::-1]  # [B, E] descending
    lam = jnp.maximum(lam, 0.0)
    top = lam[..., : k_max + 1]
    gaps = (top[..., :-1] - top[..., 1:]) / (top[..., :-1] + _EPS)
    return (jnp.argmax(gaps, axis=-1) + 1).astype(jnp.int32)


def count_speakers(
    model,
    params: dict,
    mix: jnp.ndarray,  # [B, T]
    k_max: int = 4,
    frame_mask: jnp.ndarray | None = None,
    weight_kind: str = "vad",
) -> jnp.ndarray:
    """Estimate the number of speakers in each mixture (int32 [B]).

    Works for any model with an embedding head: DPCLModel (.embed) or
    ChimeraModel (DC head of .heads).  weight_kind picks the Gram's bin
    weighting (models/front.py::bin_weights): "vad" matches clustering
    inference exactly; "magnitude"/"magvad" emphasize loud bins — measured
    on count-diverse CPU models to roughly double 2-mix count accuracy
    (quality_results count_rules rows) because quiet bins cluster noisily
    and flatten the spectrum.
    """
    from amss_tpu.models.front import bin_weights

    c = model.cfg
    codes, _ = model.front.encode(params["front"], mix)
    feats = model.front.features(params["front"], codes)
    if hasattr(model, "embed"):
        v = model.embed(params, feats, frame_mask)
    elif hasattr(model, "heads"):
        v = model.heads(params, feats, frame_mask)[0]
    else:
        raise TypeError(
            f"{type(model).__name__} has no embedding head; speaker-count "
            "estimation needs a clustering model (dpcl/chimera)"
        )
    w = bin_weights(codes, weight_kind, c.vad_threshold_db)
    if frame_mask is not None:
        w = w * frame_mask[..., None]
    b = v.shape[0]
    return eigengap_counts(
        v.reshape(b, -1, c.sep.embed_dim), w.reshape(b, -1), k_max=k_max
    )
