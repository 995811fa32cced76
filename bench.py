"""Headline benchmark: end-to-end streaming separation RTF on one chip.

Runs the flagship DPCL pipeline (STFT front -> 2x300 BLSTM -> embeddings ->
on-device k-means -> masks -> iSTFT overlap-add) on batches of 8 s utterances
and reports the real-time factor per chip.

Target (BASELINE.json:5): RTF < 0.05 per v5e chip, audio-in -> audio-out.
``vs_baseline`` = target_rtf / measured_rtf (>1 means better than target).

Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.train.engine import make_model

    recipe = c1_stft_dpcl()
    model = make_model(recipe.model)
    params = model.init(jax.random.PRNGKey(0))

    sample_rate = 8000
    seconds = 8.0
    batch = 8
    t = int(seconds * sample_rate)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((batch, t)), jnp.float32)

    fn = jax.jit(lambda p, m: model.separate(p, m))
    est = fn(params, mix)  # compile + warmup
    assert est.shape == (batch, 2, t)
    _ = np.asarray(est[:, :, :4])  # host fetch = real sync (axon tunnel's
    # block_until_ready returns before remote execution finishes)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        est = fn(params, mix)
        _ = np.asarray(est[:, :, :4])  # depends on full est -> forces completion
    dt = time.perf_counter() - t0

    audio_seconds = iters * batch * seconds
    rtf = dt / audio_seconds
    target = 0.05
    print(
        json.dumps(
            {
                "metric": "streaming_separation_rtf_8s_batch8",
                "value": round(rtf, 6),
                "unit": "rtf_per_chip",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
