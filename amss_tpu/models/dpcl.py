"""Deep clustering (DPCL) separator.

Capability parity: the reference's models/dpcl.py (SURVEY.md §2.3), after
Hershey et al. 2016 (SURVEY.md §2.9).  BLSTM -> per-TF-bin embedding V (tanh,
L2-normalized); training minimizes the affinity mismatch ||VV^T - YY^T||_F^2
in EXPANDED GRAM FORM — E x E and E x S grams only (MXU-sized), never the
(T'·F)^2 affinity matrix.  Loss bins are weighted by cfg.weight_kind (binary
VAD, magnitude-ratio, or both — models/front.py bin_weights).  Inference
clusters embeddings with on-device k-means (SURVEY.md §2.4) and applies
distance-softmax soft masks by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amss_tpu.models.base import SeparatorBase, _EPS
from amss_tpu.models.blstm import _init_dense, dense
from amss_tpu.models.front import vad_weights, _one_hot_last
from amss_tpu.ops.kmeans import kmeans
from amss_tpu.utils.config import ModelConfig


def dpcl_loss(
    v: jnp.ndarray,  # [B, T', F, E] unit-norm embeddings
    y: jnp.ndarray,  # [B, T', F, S] one-hot targets
    w: jnp.ndarray,  # [B, T', F] bin weights
) -> jnp.ndarray:
    """Weighted ||VV^T - YY^T||_F^2 via Gram expansion, mean over batch."""
    b = v.shape[0]
    e = v.shape[-1]
    s = y.shape[-1]
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[..., None]
    vw = (v * sw).reshape(b, -1, e)  # [B, N, E]
    yw = (y * sw).reshape(b, -1, s)  # [B, N, S]
    vtv = jnp.einsum("bne,bnf->bef", vw, vw, preferred_element_type=jnp.float32)
    vty = jnp.einsum("bne,bns->bes", vw, yw, preferred_element_type=jnp.float32)
    yty = jnp.einsum("bns,bnt->bst", yw, yw, preferred_element_type=jnp.float32)
    per = (
        jnp.sum(vtv**2, axis=(-2, -1))
        - 2.0 * jnp.sum(vty**2, axis=(-2, -1))
        + jnp.sum(yty**2, axis=(-2, -1))
    )
    norm = jnp.maximum(jnp.sum(w.reshape(b, -1), axis=-1), 1.0) ** 2
    return jnp.mean(per / norm)


class DPCLModel(SeparatorBase):
    def __init__(self, cfg: ModelConfig):
        assert cfg.kind == "dpcl"
        super().__init__(cfg)

    def init(self, key) -> dict:
        kf, kt, kp = jax.random.split(key, 3)
        c = self.cfg
        return {
            "front": self.front.init(kf),
            "separator": {
                **self.init_trunk(kt),
                "proj": _init_dense(kp, self.trunk_dim, c.front.feature_dim * c.sep.embed_dim),
            },
        }

    def embed(
        self,
        params: dict,
        feats: jnp.ndarray,
        frame_mask: jnp.ndarray | None = None,
        rng=None,
    ) -> jnp.ndarray:
        """features [B, T', F] -> unit embeddings [B, T', F, E]."""
        c = self.cfg
        h = self.trunk(params["separator"], feats, frame_mask, rng=rng)
        v = dense(params["separator"]["proj"], h, self._compute_dtype())
        v = v.reshape(*feats.shape, c.sep.embed_dim)
        v = jnp.tanh(v)
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _EPS)

    def loss(
        self, params: dict, sources: jnp.ndarray, rng=None
    ) -> tuple[jnp.ndarray, dict]:
        """Training objective from raw source chunks [B, S, T] (mixing on device).

        With a learned front and recon_weight > 0, adds the waveform-domain
        mixture-reconstruction term of the end-to-end finetune recipe
        (SURVEY.md §3.3) so the filterbank stays invertible while the
        embedding loss shapes it."""
        mix, codes, aux, _, y, w, _ = self.encode_mix_and_sources(
            params, sources, rng=rng
        )
        feats = self.front.features(params["front"], codes)
        v = self.embed(params, feats, rng=rng)
        l_dc = dpcl_loss(v, y, w)
        metrics = {"dpcl_loss": l_dc}
        l = l_dc
        if self.cfg.recon_weight > 0.0:
            recon = self.front.decode(params["front"], codes, aux, mix.shape[-1])
            l_rec = jnp.mean((recon - mix) ** 2)
            metrics["recon_l2"] = l_rec
            l = l + self.cfg.recon_weight * l_rec
        return l, metrics

    def separate(
        self,
        params: dict,
        mix: jnp.ndarray,
        kmeans_iters: int = 10,
        frame_mask: jnp.ndarray | None = None,
        soft_masks: bool = True,
        tau: float = 0.5,
        n_speakers: int | None = None,
    ):
        """mix [B, T] -> separated [B, S, T], fully on device (no host k-means).

        frame_mask [B, T'] marks valid (non-padding) frames for bucketed
        variable-length batches (BASELINE.json:11): padded frames are excluded
        from normalization, recurrence, and clustering.

        n_speakers overrides cfg.nb_speakers as the cluster count — the
        embedding head is count-agnostic, so the SAME trained weights separate
        any k (pair with infer.count.count_speakers for blind auto-k).
        """
        c = self.cfg
        k = n_speakers or c.nb_speakers
        length = mix.shape[-1]
        codes, aux = self.front.encode(params["front"], mix)
        feats = self.front.features(params["front"], codes)
        v = self.embed(params, feats, frame_mask)
        b = v.shape[0]
        w = vad_weights(codes, c.vad_threshold_db)
        if frame_mask is not None:
            w = w * frame_mask[..., None]
        flat_v = v.reshape(b, -1, c.sep.embed_dim)
        flat_w = w.reshape(b, -1)
        cent, assign = kmeans(flat_v, k=k, iters=kmeans_iters, weights=flat_w)
        if soft_masks:
            from amss_tpu.ops.kmeans import soft_assignments

            masks = soft_assignments(flat_v, cent, tau=tau).reshape(
                *codes.shape, k
            )
        else:
            masks = _one_hot_last(assign, k, codes.dtype).reshape(
                *codes.shape, k
            )
        return self.apply_masks_and_decode(params, codes, aux, masks, length)
