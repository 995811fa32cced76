"""Arbitrarily long utterance separation at O(chunk) memory.

Capability parity: SURVEY.md §5.7 — the reference processed whole utterances
in one unrolled BLSTM pass (memory-bound); the TPU build scales sequence
length by chunked processing with overlap.  The BLSTM is bidirectional, so
instead of carried state this uses the standard overlap-discard scheme:

  * split the mixture into chunks of C samples with O samples of context on
    each side (one compiled program for ALL chunks: static shapes),
  * separate each padded chunk independently (vmapped/batched),
  * STITCH speakers ACROSS CHUNKS: k-means labels are arbitrary per chunk, so
    consecutive chunks are aligned by maximum cross-correlation of their
    overlapping separated audio (static S! permutations),
  * linear crossfade in the overlap region.

Memory is O(C + 2·O) regardless of utterance length; RTF stays flat.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


# Static chunk-batch widths: every long utterance runs through compiled
# [width, chunk] programs regardless of its length (a dynamic n_chunks
# batch dim would recompile per distinct utterance length — minutes each
# through the axon tunnel).  The main width amortizes per-call overhead and
# runs the chip at its better large-batch efficiency (measured: b8 serves
# ~25% cheaper per audio-second than b4); the tail width keeps the last
# partial group from padding up to the full main width (a 9-chunk utterance
# runs one 8-group + one 4-tail instead of 3 sequential 4-groups).
CHUNK_BATCH = 8
TAIL_BATCH = 4


def _get_chunk_fn(model, chunk: int, **separate_kwargs):
    """Per-model jit cache keyed on (chunk, kwargs): a fresh jit(lambda) each
    call would re-trace and re-compile every invocation."""
    cache = model.__dict__.setdefault("_long_jit_cache", {})
    key = (chunk, tuple(sorted(separate_kwargs.items())))
    if key not in cache:
        cache[key] = jax.jit(lambda p, m: model.separate(p, m, **separate_kwargs))
    return cache[key]


def warm_long(model, params, chunk: int = 65536, **separate_kwargs) -> float:
    """Compile the chunked-separation programs (main + tail width) on zeros;
    returns the seconds spent, so callers can book it as compile time rather
    than serving time (the RTF meter must not charge one-time XLA compiles
    to compute)."""
    import time

    fn = _get_chunk_fn(model, chunk, **separate_kwargs)
    t0 = time.perf_counter()
    for width in sorted({CHUNK_BATCH, TAIL_BATCH}):
        out = fn(params, jnp.zeros((width, chunk), jnp.float32))
        np.asarray(out[0, 0, :4])  # host fetch = real sync through the tunnel
    return time.perf_counter() - t0


def _group_widths(n_chunks: int) -> list[int]:
    """Static-shape schedule covering ``n_chunks``: CHUNK_BATCH-wide groups,
    with the final remainder dropped to TAIL_BATCH-wide groups when that
    wastes less padded compute."""
    widths, left = [], n_chunks
    while left >= CHUNK_BATCH:
        widths.append(CHUNK_BATCH)
        left -= CHUNK_BATCH
    while left > 0:
        w = TAIL_BATCH if left <= TAIL_BATCH else CHUNK_BATCH
        widths.append(w)
        left -= w
    return widths


def separate_long(
    model,
    params,
    mix: np.ndarray,  # [T] arbitrary length
    chunk: int = 65536,
    overlap: int = 4096,
    **separate_kwargs,
) -> np.ndarray:
    """-> [S, T].  Single long utterance, chunked overlap-discard separation."""
    t = len(mix)
    if t <= chunk:
        est = model.separate(params, jnp.asarray(mix[None]), **separate_kwargs)
        return np.asarray(est[0])

    overlap = min(overlap, chunk // 4)  # overlap must leave a positive hop
    hop = chunk - overlap
    n_chunks = -(-max(t - overlap, 1) // hop)
    t_pad = (n_chunks - 1) * hop + chunk
    mix_p = np.zeros(t_pad, np.float32)
    mix_p[:t] = mix

    starts = [i * hop for i in range(n_chunks)]
    batch = np.stack([mix_p[s : s + chunk] for s in starts])

    fn = _get_chunk_fn(model, chunk, **separate_kwargs)
    # Fixed-width groups (last groups dropped to the tail width, zero-padded):
    # static shapes end-to-end, one compile per (width, chunk).  ALL groups
    # are dispatched before any result is fetched — JAX's async dispatch
    # queues them on the device, so group k+1's host->device transfer and
    # dispatch overlap group k's compute instead of paying (round trip +
    # transfer + compute) sequentially per group (the round-3 longform path
    # synchronized after every group and missed the 0.05 RTF target on
    # exactly that serialization).
    pending = []
    g0 = 0
    for width in _group_widths(n_chunks):
        grp = batch[g0 : g0 + width]
        n_real = grp.shape[0]
        if n_real < width:
            grp = np.concatenate(
                [grp, np.zeros((width - n_real, chunk), np.float32)]
            )
        pending.append((fn(params, jnp.asarray(grp)), n_real))
        g0 += width
    est = np.concatenate([np.asarray(h)[:n] for h, n in pending])

    return stitch_chunks(est, starts, overlap, t, t_pad)


def separate_long_sharded(
    model,
    params,
    mix: np.ndarray,  # [T] arbitrary length
    mesh=None,
    chunk: int = 65536,
    overlap: int = 4096,
    chunk_batch_per_device: int = CHUNK_BATCH,
    **separate_kwargs,
) -> np.ndarray:
    """-> [S, T].  Time-parallel long-audio inference over a device mesh
    (beyond reference — SURVEY.md §2.7: the reference was single-device).

    The chunk axis IS a batch axis: the [D·CB, chunk] group is sharded over
    the mesh's ``data`` axis (params replicated), so D devices separate D·CB
    chunks per dispatch — an hour of audio crosses a pod in one pjit program
    per group, near-linear in D.  Each chunk is computed entirely on one
    device; no collectives are needed (the only cross-chunk coupling —
    speaker alignment + crossfade — is the host-side stitcher both paths
    share).  Static shapes: one compile per (chunk, mesh) regardless of
    utterance length, zero-padded last group.

    Exactness: for deterministic mask heads (tasnet) output is bitwise equal
    to separate_long (tested).  For clustering models (dpcl/chimera) the
    partitioned compile's different layout can flip bit-level argmax ties
    inside hard k-means, yielding a different-but-equally-valid clustering
    for some chunks — same quality, not sample-identical (measured on the
    8-virtual-device CPU mesh; the stitcher still aligns speaker order)."""
    from amss_tpu.parallel.mesh import batch_sharding, make_mesh, \
        replicated_sharding

    mesh = mesh if mesh is not None else make_mesh()
    t = len(mix)
    if t <= chunk:
        est = model.separate(params, jnp.asarray(mix[None]), **separate_kwargs)
        return np.asarray(est[0])

    overlap = min(overlap, chunk // 4)
    hop = chunk - overlap
    n_chunks = -(-max(t - overlap, 1) // hop)
    t_pad = (n_chunks - 1) * hop + chunk
    mix_p = np.zeros(t_pad, np.float32)
    mix_p[:t] = mix
    starts = [i * hop for i in range(n_chunks)]
    batch = np.stack([mix_p[s : s + chunk] for s in starts])

    group = len(mesh.devices.flat) * chunk_batch_per_device
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    cache = model.__dict__.setdefault("_long_mesh_jit_cache", {})
    key = (chunk, group, tuple(d.id for d in mesh.devices.flat),
           tuple(sorted(separate_kwargs.items())))
    if key not in cache:
        cache[key] = jax.jit(
            lambda p, m: model.separate(p, m, **separate_kwargs),
            in_shardings=(rsh, bsh),
            out_shardings=bsh,
        )
    fn = cache[key]
    params_r = jax.device_put(params, rsh)

    # Dispatch every group before fetching any (async dispatch pipelines
    # group k+1's transfer against group k's compute — same scheme as
    # separate_long).
    pending = []
    for g0 in range(0, n_chunks, group):
        grp = batch[g0 : g0 + group]
        n_real = grp.shape[0]
        if n_real < group:
            grp = np.concatenate(
                [grp, np.zeros((group - n_real, chunk), np.float32)]
            )
        pending.append((fn(params_r, jax.device_put(grp, bsh)), n_real))
    est = np.concatenate([np.asarray(h)[:n] for h, n in pending])
    return stitch_chunks(est, starts, overlap, t, t_pad)


def stitch_chunks(
    est: np.ndarray,  # [n_chunks, S, chunk] per-chunk separated audio
    starts: list[int],
    overlap: int,
    t: int,
    t_pad: int,
) -> np.ndarray:
    """-> [S, t].  Speaker-align consecutive chunks by overlap correlation
    (k-means labels are arbitrary per chunk) and crossfade the overlaps.
    Pure numpy — shared by the live model path (separate_long) and the AOT
    artifact path (infer/export.py::ServingArtifact.separate_long)."""
    n_chunks, s_dim, chunk = est.shape
    perms = list(itertools.permutations(range(s_dim)))
    out = np.zeros((s_dim, t_pad), np.float32)
    out[:, :chunk] = est[0]
    fade_in = np.linspace(0.0, 1.0, overlap, dtype=np.float32)

    for ci in range(1, n_chunks):
        s0 = starts[ci]
        prev_tail = out[:, s0 : s0 + overlap]  # already-stitched audio
        # Align this chunk's speaker order to the previous by overlap correlation.
        best, best_score = 0, -np.inf
        for pi, perm in enumerate(perms):
            score = sum(
                float(np.dot(prev_tail[k], est[ci][perm[k], :overlap]))
                for k in range(s_dim)
            )
            if score > best_score:
                best, best_score = pi, score
        aligned = est[ci][list(perms[best])]
        out[:, s0 : s0 + overlap] = (
            prev_tail * (1.0 - fade_in) + aligned[:, :overlap] * fade_in
        )
        out[:, s0 + overlap : s0 + chunk] = aligned[:, overlap:]
    return out[:, :t]
