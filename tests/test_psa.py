"""Phase-sensitive approximation targets (loss_variant="psa")."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.models.chimera import ChimeraModel
from amss_tpu.models.front import psa_targets
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def _aux(theta):
    return {"cos": jnp.cos(theta), "sin": jnp.sin(theta)}


def test_psa_target_geometry():
    """t_s = |S| cos(dphi), truncated to [0, |X|]."""
    b, s, t, f = 1, 1, 2, 3
    mix_mag = jnp.full((b, t, f), 2.0)
    src_mag = jnp.full((b, s, t, f), 1.5)
    th_mix = jnp.zeros((b, t, f))

    # aligned phase: target == |S|
    out = psa_targets(mix_mag, _aux(th_mix), src_mag, _aux(jnp.zeros((b, s, t, f))))
    np.testing.assert_allclose(np.asarray(out), 1.5)

    # orthogonal phase: cos = 0 -> target 0
    out = psa_targets(
        mix_mag, _aux(th_mix), src_mag, _aux(jnp.full((b, s, t, f), jnp.pi / 2))
    )
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    # opposite phase: negative, truncated to 0
    out = psa_targets(
        mix_mag, _aux(th_mix), src_mag, _aux(jnp.full((b, s, t, f), jnp.pi))
    )
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    # upper truncation at |X|
    big = jnp.full((b, s, t, f), 5.0)
    out = psa_targets(mix_mag, _aux(th_mix), big, _aux(jnp.zeros((b, s, t, f))))
    np.testing.assert_allclose(np.asarray(out), 2.0)


def _chimera(loss_variant):
    cfg = ModelConfig(
        kind="chimera",
        front=FrontConfig(kind="stft", win=64, hop=16),
        sep=SeparatorConfig(hidden=12, layers=1, embed_dim=4),
        nb_speakers=2,
        loss_variant=loss_variant,
    )
    return ChimeraModel(cfg)


def test_chimera_psa_differs_and_trains():
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 1024)) * 0.1
    m_msa, m_psa = _chimera("msa"), _chimera("psa")
    params = m_msa.init(jax.random.PRNGKey(0))
    l_msa, _ = m_msa.loss(params, src)
    l_psa, met = m_psa.loss(params, src)
    assert np.isfinite(float(l_msa)) and np.isfinite(float(l_psa))
    assert abs(float(l_msa) - float(l_psa)) > 1e-7  # psa changes the objective

    def loss_fn(p):
        return m_psa.loss(p, src)[0]

    p = params
    l0 = float(loss_fn(p))
    for _ in range(8):
        p = jax.tree_util.tree_map(lambda a, g: a - 0.5 * g, p, jax.grad(loss_fn)(p))
    assert float(loss_fn(p)) < l0


def test_psa_oracle_beats_ibm_oracle():
    """The PSA-optimal mask resynthesizes closer to the source than the ideal
    binary mask — the headroom psa training is meant to claim."""
    from amss_tpu.models.front import STFTFrontEnd, ideal_binary_mask
    from amss_tpu.ops.metrics import si_sdr

    front = STFTFrontEnd(FrontConfig(kind="stft", win=256, hop=64))
    rng = np.random.default_rng(0)
    t = np.arange(16384) / 8000.0
    s1 = np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    s2 = rng.normal(size=t.shape) * 0.3  # broadband
    sources = jnp.asarray(np.stack([s1, s2])[None], jnp.float32)  # [1,2,T]
    mix = jnp.sum(sources, axis=1)

    codes, aux = front.encode({}, mix)
    src_codes, src_aux = front.encode({}, sources)
    y = ideal_binary_mask(src_codes)  # [B,T',F,S]
    psa = psa_targets(codes, aux, src_codes, src_aux)  # [B,S,T',F]
    psa_mask = jnp.moveaxis(psa, 1, -1) / jnp.maximum(codes[..., None], 1e-7)

    def resynth(masks):
        masked = jnp.moveaxis(codes[..., None] * masks, -1, 1)
        aux_b = {k: v[:, None] for k, v in aux.items()}
        return front.decode({}, masked, aux_b, mix.shape[-1])

    est_ibm = resynth(y)
    est_psa = resynth(psa_mask)
    sdr_ibm = float(jnp.mean(si_sdr(est_ibm[0], sources[0])))
    sdr_psa = float(jnp.mean(si_sdr(est_psa[0], sources[0])))
    assert sdr_psa > sdr_ibm  # phase-sensitive oracle strictly better here
