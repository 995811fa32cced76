"""First-party BSS-Eval: decomposition invariants, filtering tolerance,
known-ratio SIR, permutation resolution."""

import numpy as np

from amss_tpu.ops.bss_eval import bss_eval_sources, bss_eval_batch


def _refs(t=8192, seed=0):
    rng = np.random.default_rng(seed)
    tt = np.arange(t) / 8000.0
    s1 = np.sin(2 * np.pi * 210 * tt) * (1 + 0.4 * np.sin(2 * np.pi * 3 * tt))
    s2 = rng.normal(size=t) * 0.3
    return np.stack([s1, s2]).astype(np.float64)


def test_perfect_estimate_is_near_infinite():
    ref = _refs()
    sdr, sir, sar, perm = bss_eval_sources(ref, ref.copy())
    assert (sdr > 60).all() and (sir > 60).all() and (sar > 60).all()
    np.testing.assert_array_equal(perm, [0, 1])


def test_short_fir_filtering_is_absorbed():
    """BSS-Eval's defining property vs SI-SDR: a short FIR distortion of the
    true source lives INSIDE the 512-tap projection subspace, so SDR stays
    high where plain SI-SDR collapses."""
    from amss_tpu.ops.metrics import si_sdr
    import jax.numpy as jnp

    ref = _refs()
    # 32-tap random FIR on the BROADBAND source: spectrally violent, yet
    # well inside the 512-tap allowed-distortion subspace
    h = np.random.default_rng(3).normal(size=32) * 0.3
    h[0] = 1.0
    est1 = np.convolve(ref[1], h)[: ref.shape[1]]
    est = np.stack([ref[0], est1])
    sdr, sir, sar, _ = bss_eval_sources(ref, est)
    plain = float(si_sdr(jnp.asarray(est1), jnp.asarray(ref[1])))
    assert sdr[1] > 25.0  # projection absorbs the filter
    assert plain < 10.0  # SI-SDR punishes the same distortion
    assert sdr[1] - plain > 25.0


def test_known_interference_ratio():
    """est_0 = ref_0 + a*ref_1 with orthogonal-ish refs: SIR equals the
    energy ratio |ref_0|^2 / a^2 |ref_1|^2."""
    ref = _refs()
    a = 0.1
    est = np.stack([ref[0] + a * ref[1], ref[1]])
    sdr, sir, sar, _ = bss_eval_sources(ref, est)
    expected = 10 * np.log10(np.sum(ref[0] ** 2) / (a * a * np.sum(ref[1] ** 2)))
    assert abs(sir[0] - expected) < 1.0
    assert sar[0] > 40.0  # no artifacts: est is in the refs' span


def test_artifact_only_error():
    """Additive noise orthogonal to both refs shows up in SAR, not SIR."""
    ref = _refs()
    rng = np.random.default_rng(7)
    noise = rng.normal(size=ref.shape[1]) * 0.05
    est = np.stack([ref[0] + noise, ref[1]])
    sdr, sir, sar, _ = bss_eval_sources(ref, est)
    assert sir[0] > 25.0  # little interference leakage
    assert sar[0] < sir[0]  # artifacts dominate the error


def test_permutation_detected():
    ref = _refs()
    est = ref[::-1].copy()  # swapped
    sdr, sir, sar, perm = bss_eval_sources(ref, est)
    np.testing.assert_array_equal(perm, [1, 0])
    assert (sdr > 60).all()


def test_batch_and_evaluate_separation_columns():
    from amss_tpu.infer.evaluate import evaluate_separation

    ref = _refs()[None]  # [1, 2, T]
    est = ref + 0.01 * np.random.default_rng(1).normal(size=ref.shape)
    mix = ref.sum(axis=1)
    out = evaluate_separation(est.astype(np.float32), ref.astype(np.float32),
                              mix.astype(np.float32))
    for k in ("sdr", "sir", "sar", "sdri", "si_sdri"):
        assert k in out and np.isfinite(out[k])
    assert out["sdr"] > 20.0
    assert out["sdri"] > 15.0
