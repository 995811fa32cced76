"""Sequence-parallel STFT: 8-way time sharding with halo exchange matches the
single-device result exactly (SURVEY.md §2.7 SP row)."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.ops.stft import stft_ri
from amss_tpu.parallel.timeshard import sharded_stft_ri
from jax.sharding import Mesh


def test_sharded_stft_matches_unsharded(rng):
    win, hop = 256, 64
    t = 8 * hop * 32  # divisible by P * hop
    x = jnp.asarray(rng.standard_normal((2, t)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("time",))
    re_s, im_s = sharded_stft_ri(x, win, hop, mesh)
    re_r, im_r = stft_ri(x, win, hop)
    assert re_s.shape == re_r.shape
    np.testing.assert_allclose(np.asarray(re_s), np.asarray(re_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(im_s), np.asarray(im_r), atol=1e-4)
