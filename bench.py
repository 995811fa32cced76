"""Headline benchmark: end-to-end streaming separation RTF on one chip.

Runs the flagship DPCL pipeline (STFT front -> 2x300 BLSTM -> embeddings ->
on-device k-means -> soft masks -> iSTFT overlap-add) through the production
StreamingSeparator on batches of 8 s utterances and reports the REAL-TIME
FACTOR per chip: wall seconds (including the separated-audio device->host
transfer, i.e. true audio-in -> audio-out) / seconds of audio.  XLA compile
time is excluded (tracked separately by the meter; serving reuses the cache).

Target (BASELINE.json:5): RTF < 0.05 per v5e chip.
``vs_baseline`` = target_rtf / measured_rtf (>1 means better than target).

Prints ONE JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def main():
    from amss_tpu.utils.cache import enable_compilation_cache

    try:  # amortize the ~minutes-long tunnel compiles across bench runs
        enable_compilation_cache()
    except Exception:
        pass

    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.infer.streaming import BucketSpec, StreamingSeparator
    from amss_tpu.train.engine import make_model

    recipe = c1_stft_dpcl()
    model = make_model(recipe.model)
    params = model.init(jax.random.PRNGKey(0))

    sample_rate = 8000
    seconds = 8.0
    batch = 8
    n_utts = 64
    t = int(seconds * sample_rate)
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(t).astype(np.float32) * 0.3 for _ in range(n_utts)]

    sep = StreamingSeparator(
        model, params, sample_rate=sample_rate, buckets=BucketSpec(lengths=(t,))
    )
    est = sep.separate_all(waves, max_batch=batch)
    assert len(est) == n_utts and est[0].shape == (2, t)

    rtf = sep.meter.rtf
    target = 0.05

    # MFU accounting (VERDICT r1 item 5): FLOPs of the compiled separate
    # program from XLA's cost model, achieved FLOP/s over measured compute
    # time, and fraction of the v5e peak.
    mfu_fields = {}
    try:
        import jax.numpy as jnp

        from amss_tpu.utils.profiling import compiled_flops, mfu

        nf = model.cfg.front.frames_for(t)
        f_call = compiled_flops(
            lambda p, m, fm: model.separate(p, m, frame_mask=fm),
            params,
            jnp.zeros((batch, t), jnp.float32),
            jnp.ones((batch, nf), jnp.float32),
        )
        total = f_call * (n_utts / batch)
        m = mfu(total, sep.meter.compute_seconds)
        mfu_fields = {
            "flops_per_batch_call": f_call,
            "achieved_tflops": round(m["achieved_tflops"], 3),
            "mfu_vs_v5e_peak": round(m["mfu_vs_v5e_peak"], 5),
        }
    except Exception as e:  # cost model not exposed -> still print the line
        mfu_fields = {"mfu_error": repr(e)[:120]}

    # Secondary: the TasNet flagship (c6) through the same serving harness.
    tasnet_fields = {}
    try:
        from amss_tpu.configs.recipes import c6_tasnet

        model6 = make_model(c6_tasnet().model)
        params6 = model6.init(jax.random.PRNGKey(0))
        sep6 = StreamingSeparator(
            model6, params6, sample_rate=sample_rate,
            buckets=BucketSpec(lengths=(t,)),
        )
        est6 = sep6.separate_all(waves[:32], max_batch=batch)
        assert est6[0].shape == (2, t)
        tasnet_fields = {"tasnet_rtf": round(sep6.meter.rtf, 6)}
    except Exception as e:
        tasnet_fields = {"tasnet_rtf_error": repr(e)[:120]}

    # Tertiary: causal low-latency streaming (c7) — per-chunk serving RTF
    # through RealtimeSeparator (each push pays a tunnel round trip; on-host
    # serving would be lower).
    realtime_fields = {}
    try:
        from amss_tpu.configs.recipes import c7_realtime
        from amss_tpu.infer.realtime import RealtimeSeparator

        model7 = make_model(c7_realtime().model)
        params7 = model7.init(jax.random.PRNGKey(0))
        rt = RealtimeSeparator(model7, params7, chunk_samples=8192)
        for i in range(12):
            rt.push(waves[i % len(waves)][:8192])
        realtime_fields = {"realtime_rtf_1s_chunks": round(rt.rtf, 5)}
    except Exception as e:
        realtime_fields = {"realtime_rtf_error": repr(e)[:120]}

    print(
        json.dumps(
            {
                "metric": "e2e_streaming_separation_rtf_8s",
                "value": round(rtf, 6),
                "unit": "rtf_per_chip",
                "vs_baseline": round(target / rtf, 3),
                **mfu_fields,
                **tasnet_fields,
                **realtime_fields,
            }
        )
    )


if __name__ == "__main__":
    main()
