"""IBM oracle: ideal binary masks through the full mask-apply/decode path must
give strongly positive SDRi.  Regression for the COLA edge-normalization bug
(masked inconsistent spectra were amplified ~1e8x at utterance edges)."""

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.configs.recipes import c1_stft_dpcl
from amss_tpu.data.synthetic import synth_speaker_wave
from amss_tpu.models.front import ideal_binary_mask
from amss_tpu.ops.metrics import sdr_improvement
from amss_tpu.train.engine import make_model


def test_ideal_mask_sdri_positive():
    model = make_model(c1_stft_dpcl().model)
    params = model.init(jax.random.PRNGKey(0))
    sources = jnp.asarray(
        np.stack([synth_speaker_wave(1, 16384), synth_speaker_wave(2, 16384)])[None]
    )
    mix = jnp.sum(sources, axis=1)
    codes, aux = model.front.encode(params["front"], mix)
    src_codes, _ = model.front.encode(params["front"], sources)
    y = ideal_binary_mask(src_codes)
    est = model.apply_masks_and_decode(params, codes, aux, y, 16384)
    sdri = float(sdr_improvement(est, sources, mix)[0])
    assert sdri > 7.0, f"IBM oracle SDRi {sdri} (COLA edge regression?)"


def test_masked_self_reconstruction_bounded():
    """Masking a signal's own STFT must not amplify error (edge-norm bug)."""
    from amss_tpu.ops.stft import stft_ri, istft_ri
    from amss_tpu.ops.metrics import si_sdr

    a = jnp.asarray(synth_speaker_wave(1, 16384)[None])
    b = jnp.asarray(synth_speaker_wave(2, 16384)[None])
    ra, ia = stft_ri(a, 256, 64)
    rb, ib = stft_ri(b, 256, 64)
    m = (ra**2 + ia**2 > rb**2 + ib**2).astype(jnp.float32)
    est = istft_ri(ra * m, ia * m, 256, 64, length=16384)
    kept = float(jnp.sum((ra**2 + ia**2) * m) / jnp.sum(ra**2 + ia**2))
    val = float(si_sdr(est, a)[0])
    assert kept > 0.9
    assert val > 8.0, f"masked self-recon si-sdr {val} with {kept:.2%} energy kept"
