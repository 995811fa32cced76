"""BLSTM-by-scan: shapes, mask semantics, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.models.blstm import init_blstm_stack, blstm_stack


def test_shapes(rng):
    stack = init_blstm_stack(jax.random.PRNGKey(0), n_in=10, hidden=16, layers=2)
    x = jnp.asarray(rng.standard_normal((3, 7, 10)), jnp.float32)
    out = blstm_stack(stack, x)
    assert out.shape == (3, 7, 32)


def test_mask_zeroes_padding_and_blocks_leakage(rng):
    stack = init_blstm_stack(jax.random.PRNGKey(1), n_in=4, hidden=8, layers=1)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    mask = jnp.asarray(np.array([[1] * 6 + [0] * 4, [1] * 10]), jnp.float32)
    out = np.asarray(blstm_stack(stack, x, mask=mask))
    # padded outputs are exactly zero
    np.testing.assert_array_equal(out[0, 6:], 0.0)
    # valid outputs unchanged when padding content changes (no leakage through
    # the backward direction)
    x2 = x.at[0, 6:].set(99.0)
    out2 = np.asarray(blstm_stack(stack, x2, mask=mask))
    np.testing.assert_allclose(out[0, :6], out2[0, :6], atol=1e-6)


def test_gradients_flow(rng):
    stack = init_blstm_stack(jax.random.PRNGKey(2), n_in=4, hidden=8, layers=2)
    x = jnp.asarray(rng.standard_normal((2, 5, 4)), jnp.float32)

    def loss(stack):
        return jnp.sum(blstm_stack(stack, x) ** 2)

    grads = jax.grad(loss)(stack)
    norms = [float(jnp.linalg.norm(g["fwd"]["wx"])) for g in grads]
    assert all(n > 0 for n in norms)


def test_scan_unroll_is_equivalent(rng):
    """sep.scan_unroll computes the same recurrence: equal to unroll=1 within
    fusion-reordering fp noise (~1e-8 measured; NOT bit-exact at unroll>=4,
    which is why non-default values stay in the run id)."""
    stack = init_blstm_stack(jax.random.PRNGKey(3), n_in=6, hidden=8, layers=2)
    x = jnp.asarray(rng.standard_normal((2, 13, 6)), jnp.float32)  # 13 % 4 != 0
    mask = jnp.asarray(np.array([[1] * 9 + [0] * 4, [1] * 13]), jnp.float32)
    base = np.asarray(blstm_stack(stack, x, mask=mask))
    for unroll in (2, 4, 8):
        out = np.asarray(blstm_stack(stack, x, mask=mask, unroll=unroll))
        np.testing.assert_allclose(base, out, atol=1e-6)
        # padded positions stay exactly zero regardless of unroll blocking
        np.testing.assert_array_equal(out[0, 9:], 0.0)


def test_scan_unroll_run_id_semantics():
    """Default (1) hashes like the pre-growth schema so committed run dirs
    keep their ids; non-default values fork the id (they can perturb a long
    training trajectory at the fp-fusion level)."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.utils.config import run_id, run_id_from_stored, recipe_to_dict

    r = c1_stft_dpcl()
    d = recipe_to_dict(r)
    del d["model"]["sep"]["scan_unroll"]  # pre-growth stored config.json
    assert run_id(r) == run_id_from_stored(d)
    r8 = dc.replace(
        r, model=dc.replace(r.model, sep=dc.replace(r.model.sep, scan_unroll=8))
    )
    assert run_id(r8) != run_id(r)
