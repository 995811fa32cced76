"""HBM-resident corpus: zero host->device audio traffic in the train loop.

TPU-first extension of the reference's input pipeline (SURVEY.md §2.1): the
round-1 profile showed the train step is TRANSFER-bound (11 ms device compute
vs ~27 ms wall at batch 16 even with the int16 wire format).  A speech corpus
at training scale is small next to HBM — 100 speakers x 120 s @ 8 kHz is
192 MB as int16 vs 16 GB HBM on v5e — so this module uploads every speaker
shard ONCE and the per-step "batch" becomes a (speaker, start, gain) plan of
a few hundred bytes.  Chunk gathers run inside the jit step as vmapped
dynamic slices (XLA lowers to a windowed gather; B*S*T elements of HBM
traffic, no row materialization), followed by the usual int16 dequantize and
device-side mixing.

Wrap semantics match the host path: shards shorter than the padded row are
tiled (np.resize), so a start near the end reads the wrapped continuation —
bit-identical to Mixer._chunk_wrap for in-range starts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Upload slab size.  The axon tunnel rejects oversized single HTTP bodies
# (HTTP 413) on both the compile and transfer endpoints, so a production-size
# corpus (v2max: 500 spk x 40 s = ~330 MB int16) must go up in pieces and be
# stitched on device.  64 MB slabs keep each request comfortably under the
# limit while amortizing per-request overhead.
_SLAB_BYTES = 64 << 20


def _upload_slabbed(flat_np: np.ndarray, sharding=None) -> jnp.ndarray:
    """Host int16 flat array -> one device array, transferred in <=64 MB slabs
    and concatenated on device (the concat's compile payload carries only
    shapes, never the data)."""
    slab = max(1, _SLAB_BYTES // flat_np.dtype.itemsize)
    parts = [
        jax.device_put(flat_np[i : i + slab], sharding)
        for i in range(0, flat_np.size, slab)
    ]
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts)


class DeviceCorpus:
    """All speaker shards as one device-resident int16 [n_speakers * row] flat
    array; `gather` slices chunks inside jit.

    The flat array must be threaded into jit programs as an ARGUMENT
    (``gather(..., flat=flat)``), never captured by closure: a closed-over
    concrete array is baked into the lowered HLO as a literal constant, which
    (a) bloats every (re)compile by the corpus size and (b) overflows the axon
    tunnel's remote_compile request limit (observed: HTTP 413 at ~330 MB).
    """

    def __init__(self, store, chunk_samples: int, sharding=None):
        lens = [store.n_samples(s) for s in store.speakers]
        # Row length: every shard tiled up to max(shard lens, chunk) so any
        # start in [0, len) yields a full in-row chunk.
        self.row = int(max(max(lens), chunk_samples) + chunk_samples)
        n = len(store.speakers)
        arr = np.empty((n, self.row), np.int16)
        for i, s in enumerate(store.speakers):
            w = np.asarray(store.waveform(s), np.float32)
            q = np.clip(np.round(w * 32767.0), -32767, 32767).astype(np.int16)
            arr[i] = np.resize(q, self.row)  # tile = wrap semantics
        self.flat = _upload_slabbed(arr.reshape(-1), sharding)  # [n*row] int16
        self.chunk = chunk_samples

    def gather(
        self,
        speaker_ids: jnp.ndarray,  # [B, S] int32 global store indices
        starts: jnp.ndarray,  # [B, S] int32
        gains: jnp.ndarray,  # [B, S] float32
        flat: jnp.ndarray | None = None,  # pass self.flat as a jit ARGUMENT
    ) -> jnp.ndarray:
        """-> sources [B, S, T] float32 (dequantized, gain-scaled).  Pure; call
        inside the jit step, passing ``flat`` explicitly so the corpus enters
        the program as a parameter (closure capture would constant-fold it
        into the executable — see class docstring)."""
        if flat is None:
            flat = self.flat  # eager/interactive use only
        b, s = speaker_ids.shape
        flat_idx = speaker_ids.reshape(-1).astype(jnp.int32) * self.row + starts.reshape(
            -1
        ).astype(jnp.int32)

        def one(off):
            return jax.lax.dynamic_slice_in_dim(flat, off, self.chunk)

        chunks = jax.vmap(one)(flat_idx)  # [B*S, T] int16
        out = chunks.astype(jnp.float32) * (1.0 / 32767.0)
        return out.reshape(b, s, self.chunk) * gains[..., None]
