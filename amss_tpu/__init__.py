"""amss_tpu — Adaptive Multi-Speaker Separation, TPU-native.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
Totoketchup/Adaptive-MultiSpeaker-Separation (a TF1 research codebase for
deep-clustering / L41 / adaptive-front-end speech separation; see SURVEY.md).

Design pillars (TPU-first, not a port):
  * STFT as an MXU matmul (windowed DFT folded into one weight matrix), with a
    fused Pallas frame+window+DFT kernel on the hot path.
  * BLSTM as `lax.scan` with all four gates fused into one [B, 4H] matmul per
    step and the input projection hoisted out of the scan (one big MXU matmul).
  * Deep-clustering loss in expanded Gram form (E x E / E x S grams, never the
    (T·F)^2 affinity matrix).
  * Mask inference fully on device: vmapped Lloyd k-means, attractor masking,
    overlap-add resynthesis — zero host round-trips between audio-in and
    audio-out.
  * Parallelism via `jax.sharding.Mesh` + NamedSharding inside one jit program
    (psum over ICI for data-parallel gradients); no external comm backend.

Reference provenance: /root/reference was empty at build time (SURVEY.md §0);
capability citations point at SURVEY.md sections instead of reference file:line.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import amss_tpu` free of jax init cost):

        amss_tpu.Trainer, amss_tpu.make_model, amss_tpu.StreamingSeparator,
        amss_tpu.separate_long, amss_tpu.separate_long_sharded,
        amss_tpu.RealtimeSeparator, amss_tpu.count_speakers,
        amss_tpu.SpeakerStore, amss_tpu.Mixer, amss_tpu.recipes
    """
    if name == "Trainer":
        from amss_tpu.train.engine import Trainer

        return Trainer
    if name == "make_model":
        from amss_tpu.train.engine import make_model

        return make_model
    if name == "StreamingSeparator":
        from amss_tpu.infer.streaming import StreamingSeparator

        return StreamingSeparator
    if name == "separate_long":
        from amss_tpu.infer.long import separate_long

        return separate_long
    if name == "separate_long_sharded":
        from amss_tpu.infer.long import separate_long_sharded

        return separate_long_sharded
    if name == "RealtimeSeparator":
        from amss_tpu.infer.realtime import RealtimeSeparator

        return RealtimeSeparator
    if name == "count_speakers":
        from amss_tpu.infer.count import count_speakers

        return count_speakers
    if name == "SpeakerStore":
        from amss_tpu.data.store import SpeakerStore

        return SpeakerStore
    if name == "Mixer":
        from amss_tpu.data.mixer import Mixer

        return Mixer
    if name == "recipes":
        from amss_tpu.configs import recipes

        return recipes
    raise AttributeError(f"module 'amss_tpu' has no attribute {name!r}")
