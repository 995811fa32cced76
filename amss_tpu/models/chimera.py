"""Chimera multitask separator: deep-clustering + mask-inference heads.

Capability parity: the driver-mandated Chimera config for 3-speaker WSJ0-3mix
(BASELINE.json:10; SURVEY.md §2.3 last row), after Luo et al. / Wang et al.
Chimera++ (SURVEY.md §2.9).  One BLSTM trunk, two heads:

  * DC head: per-bin embeddings, the dpcl_loss Gram objective.
  * MI head: per-bin softmax masks over S sources, magnitude-spectrum
    approximation (MSA) L2 loss, permutation-invariant (S <= 4 so the
    permutation set is enumerated statically).

Total loss alpha * L_DC + (1 - alpha) * L_MI.  Inference uses the MI masks
directly (soft), so no clustering is needed.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

from amss_tpu.models.base import SeparatorBase, _EPS
from amss_tpu.models.blstm import _init_dense, dense
from amss_tpu.models.dpcl import dpcl_loss
from amss_tpu.utils.config import ModelConfig


def msa_pit_loss(
    masks: jnp.ndarray,  # [B, T', F, S] softmax masks
    mix_codes: jnp.ndarray,  # [B, T', F]
    src_codes: jnp.ndarray,  # [B, S, T', F]
    w: jnp.ndarray,  # [B, T', F]
) -> jnp.ndarray:
    """Permutation-invariant weighted L2 between masked mixture and sources."""
    est = masks * mix_codes[..., None]  # [B, T', F, S]
    s = masks.shape[-1]
    ref = jnp.moveaxis(src_codes, 1, -1)  # [B, T', F, S]
    losses = []
    for perm in itertools.permutations(range(s)):
        diff = est[..., jnp.array(perm)] - ref
        losses.append(jnp.sum(w[..., None] * diff**2, axis=(1, 2, 3)))
    per = jnp.min(jnp.stack(losses, axis=-1), axis=-1)  # [B]
    norm = jnp.maximum(jnp.sum(w, axis=(1, 2)) * s, 1.0)
    return jnp.mean(per / norm)


class ChimeraModel(SeparatorBase):
    def __init__(self, cfg: ModelConfig):
        assert cfg.kind == "chimera"
        super().__init__(cfg)

    def init(self, key) -> dict:
        kf, kt, ke, km = jax.random.split(key, 4)
        c = self.cfg
        return {
            "front": self.front.init(kf),
            "separator": {
                **self.init_trunk(kt),
                "proj_embed": _init_dense(
                    ke, self.trunk_dim, c.front.feature_dim * c.sep.embed_dim
                ),
                "proj_mask": _init_dense(
                    km, self.trunk_dim, c.front.feature_dim * c.nb_speakers
                ),
            },
        }

    def heads(self, params, feats, frame_mask=None, rng=None):
        """-> (V [B,T',F,E] unit-norm, masks [B,T',F,S] softmax)."""
        c = self.cfg
        h = self.trunk(params["separator"], feats, frame_mask, rng=rng)
        v = dense(params["separator"]["proj_embed"], h, self._compute_dtype())
        v = jnp.tanh(v.reshape(*feats.shape, c.sep.embed_dim))
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _EPS)
        m = dense(params["separator"]["proj_mask"], h, self._compute_dtype())
        m = jax.nn.softmax(m.reshape(*feats.shape, c.nb_speakers), axis=-1)
        return v, m

    def loss(
        self, params: dict, sources: jnp.ndarray, rng=None
    ) -> tuple[jnp.ndarray, dict]:
        c = self.cfg
        mix, codes, aux, src_codes, y, w, src_aux = self.encode_mix_and_sources(
            params, sources, rng=rng
        )
        feats = self.front.features(params["front"], codes)
        v, masks = self.heads(params, feats, rng=rng)
        l_dc = dpcl_loss(v, y, w)
        # MI regression target: source magnitudes (msa) or truncated
        # phase-sensitive targets (psa, Chimera++) per cfg.loss_variant.
        l_mi = msa_pit_loss(masks, codes, self.mi_targets(codes, aux, src_codes, src_aux), w)
        l = c.chimera_alpha * l_dc + (1.0 - c.chimera_alpha) * l_mi
        metrics = {"chimera_loss": l, "dc_loss": l_dc, "mi_loss": l_mi}
        if c.recon_weight > 0.0:  # learned-front mixture-fidelity term (§3.3)
            recon = self.front.decode(params["front"], codes, aux, mix.shape[-1])
            l_rec = jnp.mean((recon - mix) ** 2)
            metrics["recon_l2"] = l_rec
            l = l + c.recon_weight * l_rec
            metrics["chimera_loss"] = l
        return l, metrics

    def separate(
        self,
        params: dict,
        mix: jnp.ndarray,
        frame_mask: jnp.ndarray | None = None,
    ):
        length = mix.shape[-1]
        codes, aux = self.front.encode(params["front"], mix)
        feats = self.front.features(params["front"], codes)
        _, masks = self.heads(params, feats, frame_mask)
        return self.apply_masks_and_decode(params, codes, aux, masks, length)
