"""Pallas kernel parity vs jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from amss_tpu.ops.framing import frame_signal, overlap_add
from amss_tpu.ops.pallas.framed_matmul import framed_matmul, pallas_stft_ri
from amss_tpu.ops.pallas.ola import pallas_decode_ola, pallas_overlap_add
from amss_tpu.ops.stft import stft_ri


def test_framed_matmul_matches_reference(rng):
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    basis = rng.standard_normal((256, 64)).astype(np.float32)
    got = np.asarray(framed_matmul(jnp.asarray(x), jnp.asarray(basis), hop=64,
                                   interpret=True, force=True))
    want = np.asarray(
        jnp.matmul(frame_signal(jnp.asarray(x), 256, 64), jnp.asarray(basis))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pallas_stft_matches_stft_ri(rng):
    x = rng.standard_normal((1, 2048)).astype(np.float32)
    re_p, im_p = pallas_stft_ri(jnp.asarray(x), 256, 64, interpret=True)
    re_r, im_r = stft_ri(jnp.asarray(x), 256, 64)
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_r), atol=2e-3)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im_r), atol=2e-3)


def test_decode_ola_matches_reference(rng):
    codes = rng.standard_normal((2, 50, 32)).astype(np.float32)
    basis = rng.standard_normal((32, 128)).astype(np.float32)
    got = np.asarray(
        pallas_decode_ola(jnp.asarray(codes), jnp.asarray(basis), hop=32,
                          interpret=True, force=True)
    )
    frames = jnp.matmul(jnp.asarray(codes), jnp.asarray(basis))
    want = np.asarray(overlap_add(frames, 32))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pallas_ola_matches_reference(rng):
    frames = rng.standard_normal((1, 40, 128)).astype(np.float32)
    got = np.asarray(pallas_overlap_add(jnp.asarray(frames), hop=32, interpret=True))
    want = np.asarray(overlap_add(jnp.asarray(frames), 32))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_framed_matmul_grads_match_jnp(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((1, 1024)), jnp.float32)
    basis = jnp.asarray(rng.standard_normal((128, 32)), jnp.float32)

    def loss_pl(x, b):
        return jnp.sum(framed_matmul(x, b, hop=32, interpret=True, force=True) ** 2)

    def loss_ref(x, b):
        return jnp.sum(jnp.matmul(frame_signal(x, 128, 32), b) ** 2)

    gx_p, gb_p = jax.grad(loss_pl, argnums=(0, 1))(x, basis)
    gx_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(x, basis)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), atol=1e-2, rtol=1e-4)


def test_decode_ola_grads_match_jnp(rng):
    import jax

    codes = jnp.asarray(rng.standard_normal((1, 30, 16)), jnp.float32)
    basis = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)

    def loss_pl(c, b):
        return jnp.sum(pallas_decode_ola(c, b, hop=32, length=900, interpret=True, force=True) ** 2)

    def loss_ref(c, b):
        return jnp.sum(overlap_add(jnp.matmul(c, b), 32, length=900) ** 2)

    gc_p, gb_p = jax.grad(loss_pl, argnums=(0, 1))(codes, basis)
    gc_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(codes, basis)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_r), atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), atol=1e-2, rtol=1e-4)


def test_framed_matmul_short_filters(rng):
    """TasNet-scale front: L=32, stride=16 (well under the 128 Mosaic lane
    width) must match the reference framing+matmul path."""
    import jax.numpy as jnp
    import numpy as np

    from amss_tpu.ops.framing import frame_signal
    from amss_tpu.ops.pallas.framed_matmul import framed_matmul

    x = rng.standard_normal((2, 2048)).astype(np.float32)
    basis = rng.standard_normal((32, 64)).astype(np.float32)
    got = np.asarray(
        framed_matmul(jnp.asarray(x), jnp.asarray(basis), hop=16, interpret=True,
                      force=True)
    )
    want = np.asarray(frame_signal(jnp.asarray(x), 32, 16) @ jnp.asarray(basis))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_decode_ola_short_filters(rng):
    import jax.numpy as jnp
    import numpy as np

    from amss_tpu.ops.framing import overlap_add
    from amss_tpu.ops.pallas.ola import pallas_decode_ola

    codes = rng.standard_normal((2, 127, 64)).astype(np.float32)
    basis = rng.standard_normal((64, 32)).astype(np.float32)
    got = np.asarray(
        pallas_decode_ola(
            jnp.asarray(codes), jnp.asarray(basis), hop=16, length=2048,
            interpret=True, force=True,
        )
    )
    want = np.asarray(
        overlap_add(jnp.asarray(codes) @ jnp.asarray(basis), 16, length=2048)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_decode_ola_hop128_no_lane_pad():
    """Regression: hop == 128 means ZERO pad lanes in the output block — the
    kernel must not build a (cb, 0) vector (Mosaic rejects empty vector
    types; this crashed the no-pool stride-128 adaptive front)."""
    rng = np.random.default_rng(0)
    codes = rng.standard_normal((2, 40, 96)).astype(np.float32)
    basis = rng.standard_normal((96, 256)).astype(np.float32)
    got = np.asarray(
        pallas_decode_ola(jnp.asarray(codes), jnp.asarray(basis), hop=128,
                          interpret=True, force=True)
    )
    frames = codes @ basis
    want = np.asarray(overlap_add(jnp.asarray(frames), 128, length=got.shape[-1]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dispatch_gate_shapes():
    """pallas_profitable: kernel at STFT shapes, XLA fallback at short-filter
    shapes (serve_bisect_r4: the kernel was ~50x slower than XLA at the
    TasNet front's win 32 / hop 16)."""
    from amss_tpu.ops.pallas.framed_matmul import pallas_profitable

    assert pallas_profitable(256, 64)        # STFT front
    assert not pallas_profitable(32, 16)     # TasNet front
    assert not pallas_profitable(256, 128)   # no-pool stride-128 front
