"""Causal streaming path: cumulative norm, causal TCN, and the exactness
contract of RealtimeSeparator (streamed chunks == offline separation)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.configs.recipes import c7_realtime
from amss_tpu.infer.realtime import RealtimeSeparator
from amss_tpu.models.front import cumulative_norm, instance_norm
from amss_tpu.models.tcn import init_tcn, tcn_stack
from amss_tpu.train.engine import make_model


def _tiny_c7():
    r = c7_realtime()
    sep = dataclasses.replace(r.model.sep, hidden=16, blocks=3, repeats=2)
    return dataclasses.replace(r.model, sep=sep)


def test_cumulative_norm_causal_and_final_stats_match_instance():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 6))
    out, totals = cumulative_norm(x)
    # causality: truncating the input leaves earlier frames unchanged
    out_trunc, _ = cumulative_norm(x[:, :9])
    np.testing.assert_allclose(np.asarray(out[:, :9]), np.asarray(out_trunc),
                               rtol=1e-6, atol=1e-6)
    # the LAST frame sees full-utterance stats == instance_norm of that frame
    np.testing.assert_allclose(
        np.asarray(out[:, -1]), np.asarray(instance_norm(x)[:, -1]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(totals[0]), 20 * 6)


def test_cumulative_norm_carry_equals_unsplit():
    """Seeding with carried stats reproduces the unsplit computation — the
    invariant RealtimeSeparator's window scrolling rests on."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 5))
    full, _ = cumulative_norm(x)
    head, stats = cumulative_norm(x[:, :10])
    tail, _ = cumulative_norm(x[:, 10:], carry=stats)
    np.testing.assert_allclose(np.asarray(full[:, 10:]), np.asarray(tail),
                               rtol=1e-5, atol=1e-5)


def test_causal_tcn_never_reads_future():
    p = init_tcn(jax.random.PRNGKey(0), 8, 12, 16, 3, repeats=2)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 40, 8))
    base = np.asarray(tcn_stack(p, x, blocks_per_repeat=3, causal=True))
    x2 = x.at[0, 25:, :].add(100.0)  # perturb the future
    pert = np.asarray(tcn_stack(p, x2, blocks_per_repeat=3, causal=True))
    np.testing.assert_array_equal(base[:, :25], pert[:, :25])
    assert np.abs(base[:, 25:] - pert[:, 25:]).max() > 0


def test_realtime_separator_exact_vs_offline():
    """The headline contract: pushing chunks through RealtimeSeparator yields
    EXACTLY model.separate's output (same jit-level numerics modulo 1e-5)."""
    cfg = _tiny_c7()
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    t = 5000  # deliberately NOT a multiple of the chunk size
    wave = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (t,)) * 0.3, np.float32
    )
    offline = np.asarray(model.separate(params, jnp.asarray(wave)[None])[0])
    rt = RealtimeSeparator(model, params, chunk_samples=1024)
    streamed = rt.separate_stream(wave)
    assert streamed.shape == offline.shape == (2, t)
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_tcn_streaming_matches_offline_causal():
    """tcn_stack_streaming with carried per-block conv state reproduces
    tcn_stack(causal=True) exactly, block-by-block, across push boundaries."""
    from amss_tpu.models.tcn import dw_state_shapes, tcn_stack_streaming

    p = init_tcn(jax.random.PRNGKey(0), 8, 12, 16, 3, repeats=2)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 8))
    full = np.asarray(tcn_stack(p, x, blocks_per_repeat=3, causal=True))
    states = [jnp.zeros((2, t, c)) for t, c in dw_state_shapes(16, 3, 2, 3)]
    outs = []
    for lo in (0, 16, 32):
        o, states = tcn_stack_streaming(p, x[:, lo : lo + 16], states,
                                        blocks_per_repeat=3)
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs, axis=1), full)


def test_welford_norm_matches_sums_norm():
    """The cancellation-free long-stream carry agrees with the exact-parity
    sums carry to fp noise (advisor r2: unbounded-stream precision)."""
    from amss_tpu.models.front import cumulative_norm_welford

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 40, 6)) + 3.0
    ref, _ = cumulative_norm(x)
    a, st = cumulative_norm_welford(x[:, :15])
    b, _ = cumulative_norm_welford(x[:, 15:], carry=st)
    got = np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_long_stream_mode_matches_offline():
    cfg = _tiny_c7()
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    wave = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (4000,)) * 0.3, np.float32
    )
    offline = np.asarray(model.separate(params, jnp.asarray(wave)[None])[0])
    rt = RealtimeSeparator(model, params, chunk_samples=1024, long_stream=True)
    np.testing.assert_allclose(rt.separate_stream(wave), offline,
                               rtol=1e-4, atol=1e-5)


def test_multi_stream_batch_matches_offline():
    """n_streams=B serves B independent utterances per push (round-trip cost
    amortized B ways); every stream must equal its own offline separation."""
    cfg = _tiny_c7()
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    waves = np.asarray(
        jax.random.normal(jax.random.PRNGKey(11), (3, 4000)) * 0.3, np.float32
    )
    offline = np.asarray(model.separate(params, jnp.asarray(waves)))
    rt = RealtimeSeparator(model, params, chunk_samples=1024, n_streams=3)
    streamed = rt.separate_streams(waves)
    assert streamed.shape == offline.shape == (3, 2, 4000)
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_pipelined_stream_matches_sync():
    """push_async/flush (dispatch k+1 before fetch k) reorders only the
    host-side fetches — output must be identical to the sync path."""
    cfg = _tiny_c7()
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    wave = np.asarray(
        jax.random.normal(jax.random.PRNGKey(13), (5000,)) * 0.3, np.float32
    )
    rt = RealtimeSeparator(model, params, chunk_samples=1024)
    sync = rt.separate_stream(wave)
    piped = rt.separate_stream_pipelined(wave)
    np.testing.assert_array_equal(sync, piped)


def test_push_rejects_wrong_chunk_shape():
    """ValueError (not a stripped assert) on a wrong-size chunk — a silent
    mis-framing corrupted the stream otherwise (advisor r2)."""
    cfg = _tiny_c7()
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rt = RealtimeSeparator(model, params, chunk_samples=1024)
    try:
        rt.push(np.zeros(1000, np.float32))
        raise AssertionError("should have rejected wrong-size chunk")
    except ValueError:
        pass


def test_realtime_rejects_noncausal_model():
    from amss_tpu.configs.recipes import c6_tasnet

    model = make_model(c6_tasnet().model)
    params = model.init(jax.random.PRNGKey(0))
    try:
        RealtimeSeparator(model, params)
        raise AssertionError("should have rejected non-causal model")
    except ValueError:
        pass


def test_separator_reusable_across_utterances():
    """Regression: one RealtimeSeparator serving MANY utterances must reset
    per-stream state (sample buffer, carried norm stats) between them —
    stale carry from utterance 1 catastrophically corrupted utterance 2+."""
    cfg = _tiny_c7()
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rt = RealtimeSeparator(model, params, chunk_samples=1024)
    for seed in (3, 4):
        wave = np.asarray(
            jax.random.normal(jax.random.PRNGKey(seed), (3000,)) * 0.3,
            np.float32,
        )
        offline = np.asarray(model.separate(params, jnp.asarray(wave)[None])[0])
        streamed = rt.separate_stream(wave)
        np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_realtime_exact_with_expansion_4():
    """The capacity knob (SeparatorConfig.expansion — canonical Conv-TasNet
    H = 4B, flagship2) threads through init, offline separate, and the
    streaming conv-state shapes identically to the default expansion=2."""
    cfg = _tiny_c7()
    cfg = dataclasses.replace(
        cfg, sep=dataclasses.replace(cfg.sep, expansion=4)
    )
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # conv channels really are expansion * hidden
    assert params["separator"]["tcn"]["blocks"][0]["dw"].shape[-1] == 4 * 16
    t = 3000
    wave = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (t,)) * 0.3, np.float32
    )
    offline = np.asarray(model.separate(params, jnp.asarray(wave)[None])[0])
    rt = RealtimeSeparator(model, params, chunk_samples=1024)
    streamed = rt.separate_stream(wave)
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_multi_stream_ragged_end_frames():
    """Streams in one batch may carry different utterance lengths: end_frame
    is per-stream ([B] int32), so each slot's decode masking cuts off at its
    own utterance end and matches that stream's offline separation."""
    cfg = _tiny_c7()
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    lens = [4000, 2500]
    waves = [
        np.asarray(jax.random.normal(jax.random.PRNGKey(20 + i), (t,)) * 0.3,
                   np.float32)
        for i, t in enumerate(lens)
    ]
    offline = [np.asarray(model.separate(params, jnp.asarray(w[None])))[0]
               for w in waves]

    rt = RealtimeSeparator(model, params, chunk_samples=1024, n_streams=2)
    t_max = max(lens)
    n_chunks, _ = rt._plan(t_max)
    padded = np.zeros((2, n_chunks * rt.c), np.float32)
    for i, w in enumerate(waves):
        padded[i, : lens[i]] = w
    nf = np.asarray([model.cfg.front.frames_for(t) for t in lens], np.int32)
    outs = [rt.push(padded[:, k * rt.c : (k + 1) * rt.c], end_frame=nf)
            for k in range(n_chunks)]
    full = np.concatenate(outs, axis=-1)  # [2, S, n*c], lags by rt.lag
    for i, t in enumerate(lens):
        np.testing.assert_allclose(
            full[i, :, rt.lag : rt.lag + t], offline[i], rtol=1e-4, atol=1e-5
        )
