"""Blind speaker-count estimation (infer/count.py): eigengap recovery on
constructed embeddings, weight masking, model integration (dpcl + chimera
heads), and variable-k separation with fixed trained weights."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.infer.count import count_speakers, eigengap_counts
from amss_tpu.models.chimera import ChimeraModel
from amss_tpu.models.dpcl import DPCLModel
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def _clustered_embeddings(k, n=600, e=20, noise=0.05, seed=0):
    """Unit vectors around k orthogonal centers (ideal DPCL geometry)."""
    g = np.random.default_rng(seed)
    centers = np.eye(e, dtype=np.float32)[:k]
    idx = g.integers(0, k, size=n)
    v = centers[idx] + noise * g.normal(size=(n, e)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v


def test_eigengap_recovers_k():
    for k in (1, 2, 3, 4):
        v = _clustered_embeddings(k)[None]
        w = jnp.ones(v.shape[:2], jnp.float32)
        est = np.asarray(eigengap_counts(jnp.asarray(v), w, k_max=4))
        assert est.tolist() == [k], f"k={k} estimated {est}"


def test_eigengap_batched_and_unbalanced():
    vs = [
        _clustered_embeddings(2, seed=1),
        _clustered_embeddings(3, seed=2),
    ]
    # unbalanced 2-cluster case: 80/20 split
    g = np.random.default_rng(3)
    idx = (g.random(600) < 0.2).astype(int)
    centers = np.eye(20, dtype=np.float32)[:2]
    v = centers[idx] + 0.05 * g.normal(size=(600, 20)).astype(np.float32)
    vs.append(v / np.linalg.norm(v, axis=-1, keepdims=True))
    batch = jnp.asarray(np.stack(vs))
    w = jnp.ones(batch.shape[:2], jnp.float32)
    est = np.asarray(eigengap_counts(batch, w, k_max=4))
    assert est.tolist() == [2, 3, 2]


def test_eigengap_weights_mask_points():
    # 2 real clusters plus a third "cluster" of zero-weight (padding) points
    v2 = _clustered_embeddings(2, n=400)
    pad = np.tile(np.eye(20, dtype=np.float32)[5], (200, 1))
    v = jnp.asarray(np.concatenate([v2, pad])[None])
    w = jnp.asarray(np.concatenate([np.ones(400), np.zeros(200)])[None].astype(np.float32))
    assert np.asarray(eigengap_counts(v, w, k_max=4)).tolist() == [2]
    # with uniform weights the padding cluster IS counted
    w1 = jnp.ones_like(w)
    assert np.asarray(eigengap_counts(v, w1, k_max=4)).tolist() == [3]


def test_eigengap_needs_wide_embeddings():
    v = jnp.ones((1, 10, 4))
    w = jnp.ones((1, 10))
    try:
        eigengap_counts(v, w, k_max=4)
        assert False, "expected ValueError"
    except ValueError:
        pass


def _model_cfg(kind):
    return ModelConfig(
        kind=kind,
        front=FrontConfig(kind="stft", win=128, hop=32),
        sep=SeparatorConfig(hidden=32, layers=1, embed_dim=8),
        nb_speakers=2,
    )


def test_count_speakers_model_paths():
    mix = jax.random.normal(jax.random.PRNGKey(0), (2, 2048)) * 0.1
    for cls, kind in ((DPCLModel, "dpcl"), (ChimeraModel, "chimera")):
        model = cls(_model_cfg(kind))
        params = model.init(jax.random.PRNGKey(1))
        est = np.asarray(count_speakers(model, params, mix, k_max=4))
        assert est.shape == (2,) and est.dtype == np.int32
        assert np.all((est >= 1) & (est <= 4))
        for wk in ("magnitude", "magvad"):
            est_w = np.asarray(count_speakers(model, params, mix, k_max=4,
                                              weight_kind=wk))
            assert est_w.shape == (2,)
            assert np.all((est_w >= 1) & (est_w <= 4))


def test_dpcl_separate_variable_k():
    """One set of weights separates at any k (count-agnostic embeddings)."""
    model = DPCLModel(_model_cfg("dpcl"))
    params = model.init(jax.random.PRNGKey(1))
    mix = jax.random.normal(jax.random.PRNGKey(0), (1, 2048)) * 0.1
    for k in (2, 3):
        est = model.separate(params, mix, n_speakers=k)
        assert est.shape == (1, k, 2048)
        # masks partition the mixture: soft masks sum to ~1 per bin, so the
        # stems resynthesize close to the mixture
        recon = np.asarray(jnp.sum(est, axis=1))
        mse = np.mean((recon - np.asarray(mix)) ** 2) / np.mean(np.asarray(mix) ** 2)
        assert mse < 0.05
