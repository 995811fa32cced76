"""SI-SDR / PIT metric tests."""

import jax.numpy as jnp
import numpy as np

from amss_tpu.ops.metrics import si_sdr, pit_si_sdr, permute_estimates, sdr_improvement


def test_si_sdr_perfect_is_large(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    val = float(si_sdr(jnp.asarray(x), jnp.asarray(x)))
    assert val > 60.0


def test_si_sdr_scale_invariant(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    a = float(si_sdr(jnp.asarray(x), jnp.asarray(x * 3.7)))
    assert a > 60.0


def test_si_sdr_known_snr(rng):
    x = rng.standard_normal(40000).astype(np.float32)
    n = rng.standard_normal(40000).astype(np.float32)
    n = n / np.linalg.norm(n) * np.linalg.norm(x) * 0.1  # -20 dB noise
    val = float(si_sdr(jnp.asarray(x + n), jnp.asarray(x), zero_mean=False))
    assert abs(val - 20.0) < 0.5


def test_pit_finds_permutation(rng):
    ref = rng.standard_normal((2, 3, 1000)).astype(np.float32)
    est = ref[:, ::-1, :].copy()  # swapped estimates
    score, perm = pit_si_sdr(jnp.asarray(est), jnp.asarray(ref))
    assert np.all(np.asarray(score) > 60.0)
    fixed = permute_estimates(jnp.asarray(est), perm)
    np.testing.assert_allclose(np.asarray(fixed), ref, atol=1e-5)


def test_pit_three_speakers(rng):
    ref = rng.standard_normal((3, 2000)).astype(np.float32)
    order = [2, 0, 1]
    est = ref[order]
    score, _ = pit_si_sdr(jnp.asarray(est), jnp.asarray(ref))
    assert float(score) > 60.0


def test_sdri_zero_for_mixture_as_estimate(rng):
    s = rng.standard_normal((2, 8000)).astype(np.float32)
    mix = s.sum(0)
    est = np.stack([mix, mix])
    val = float(sdr_improvement(jnp.asarray(est), jnp.asarray(s), jnp.asarray(mix)))
    assert abs(val) < 1e-3


def test_compiled_flops_and_mfu():
    """XLA cost-model FLOPs for a known matmul + MFU arithmetic."""
    import jax.numpy as jnp

    from amss_tpu.utils.profiling import compiled_flops, mfu

    f = compiled_flops(lambda a, b: a @ b, jnp.ones((64, 128)), jnp.ones((128, 32)))
    assert f == 2 * 64 * 128 * 32
    m = mfu(f, 1.0, peak=1e6)
    assert abs(m["achieved_tflops"] - f / 1e12) < 1e-18
    assert abs(m["mfu_vs_v5e_peak"] - f / 1e6) < 1e-9
