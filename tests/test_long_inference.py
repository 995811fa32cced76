"""Chunked long-utterance separation: O(chunk) memory, speaker-stitched."""

import dataclasses

import jax
import numpy as np

from amss_tpu.configs.recipes import c1_stft_dpcl
from amss_tpu.infer.long import separate_long
from amss_tpu.train.engine import make_model


def _tiny_model():
    r = c1_stft_dpcl()
    cfg = dataclasses.replace(
        r.model, sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4)
    )
    model = make_model(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def test_long_matches_length_and_is_finite(rng):
    model, params = _tiny_model()
    t = 20000  # forces 3 chunks at chunk=8192, overlap=1024
    mix = rng.standard_normal(t).astype(np.float32)
    est = separate_long(model, params, mix, chunk=8192, overlap=1024)
    assert est.shape == (2, t)
    assert np.isfinite(est).all()


def test_short_input_single_pass(rng):
    model, params = _tiny_model()
    mix = rng.standard_normal(4096).astype(np.float32)
    est = separate_long(model, params, mix, chunk=8192, overlap=1024)
    assert est.shape == (2, 4096)


def _tiny_tasnet():
    from amss_tpu.configs.recipes import c6_tasnet

    r = c6_tasnet()
    cfg = dataclasses.replace(
        r.model,
        sep=dataclasses.replace(r.model.sep, hidden=32, blocks=2, repeats=1,
                                embed_dim=4),
    )
    model = make_model(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def test_long_sharded_matches_single_device(rng):
    """Time-parallel long inference over the 8-virtual-device mesh equals the
    single-device chunked path for a deterministic mask head (same per-chunk
    program, shared stitcher).  Clustering models are excluded by design:
    the partitioned compile can flip bit-level argmax ties inside hard
    k-means (see separate_long_sharded docstring)."""
    from amss_tpu.infer.long import separate_long_sharded
    from amss_tpu.parallel.mesh import make_mesh

    model, params = _tiny_tasnet()
    # 8 devices x 1 chunk/device per group, and enough audio that the second
    # group is a zero-padded partial (n_chunks = 11 at chunk=4096, hop=3584)
    t = 40000
    mix = rng.standard_normal(t).astype(np.float32)
    ref = separate_long(model, params, mix, chunk=4096, overlap=512)
    got = separate_long_sharded(
        model, params, mix, mesh=make_mesh(8), chunk=4096, overlap=512,
        chunk_batch_per_device=1,
    )
    assert got.shape == (2, t)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_long_sharded_clustering_valid(rng):
    """Clustering model through the sharded path: valid shape/finiteness and
    chunk-0 parity (single-chunk programs match; later chunks may differ by
    k-means tie flips, which is the documented contract)."""
    from amss_tpu.infer.long import separate_long_sharded
    from amss_tpu.parallel.mesh import make_mesh

    model, params = _tiny_model()
    t = 20000
    mix = rng.standard_normal(t).astype(np.float32)
    got = separate_long_sharded(
        model, params, mix, mesh=make_mesh(8), chunk=8192, overlap=1024,
        chunk_batch_per_device=1,
    )
    assert got.shape == (2, t)
    assert np.isfinite(got).all()
