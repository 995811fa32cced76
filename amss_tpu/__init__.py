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
