"""L41 / speaker-centroid separator (Lab41 "Magnolia" style).

Capability parity: the reference's models/L41.py (SURVEY.md §2.3) — BLSTM
embeddings PLUS a learned per-speaker centroid table over the training-set
speakers; loss is sigmoid cross-entropy of <v_tf, c_s> against the ideal mask
for the speakers actually in each mixture.  Gives enrolled-speaker masking:
at inference, known speakers need no clustering (BASELINE.json:9).

TPU notes: the centroid table is a plain [n_speakers, E] matrix; per-batch
gathers are XLA `take`.  If the speaker inventory ever grows huge the table
shards over the data mesh axis (SURVEY.md §2.7 TP row) — at reference scale it
stays replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from amss_tpu.models.base import SeparatorBase, _EPS
from amss_tpu.models.blstm import _init_dense, dense
from amss_tpu.models.front import vad_weights, _one_hot_last
from amss_tpu.ops.kmeans import kmeans
from amss_tpu.utils.config import ModelConfig


class L41Model(SeparatorBase):
    def __init__(self, cfg: ModelConfig):
        assert cfg.kind == "l41"
        if cfg.n_train_speakers <= 0:
            raise ValueError("L41 needs n_train_speakers > 0 (centroid table size)")
        super().__init__(cfg)

    def init(self, key) -> dict:
        kf, kt, kp, kc = jax.random.split(key, 4)
        c = self.cfg
        return {
            "front": self.front.init(kf),
            "separator": {
                **self.init_trunk(kt),
                "proj": _init_dense(
                    kp, self.trunk_dim, c.front.feature_dim * c.sep.embed_dim
                ),
                "centroids": jax.random.normal(
                    kc, (c.n_train_speakers, c.sep.embed_dim)
                )
                * 0.5,
            },
        }

    def embed(self, params, feats, frame_mask=None, rng=None):
        c = self.cfg
        h = self.trunk(params["separator"], feats, frame_mask, rng=rng)
        v = dense(params["separator"]["proj"], h, self._compute_dtype())
        v = v.reshape(*feats.shape, c.sep.embed_dim)
        return jnp.tanh(v)  # L41 keeps scale information (no L2 normalize)

    def _logits(self, params, v: jnp.ndarray, speaker_ids: jnp.ndarray):
        """<v_tf, c_s> for the mixture's speakers: [B,T',F,E]x[B,S,E]->[B,T',F,S]."""
        cent = jnp.take(params["separator"]["centroids"], speaker_ids, axis=0)
        return jnp.einsum(
            "btfe,bse->btfs", v, cent, preferred_element_type=jnp.float32
        )

    def loss(
        self, params: dict, sources: jnp.ndarray, speaker_ids: jnp.ndarray, rng=None
    ) -> tuple[jnp.ndarray, dict]:
        """sources [B,S,T], speaker_ids [B,S] (global train-set indices)."""
        _, codes, _, _, y, w, _ = self.encode_mix_and_sources(
            params, sources, rng=rng
        )
        feats = self.front.features(params["front"], codes)
        v = self.embed(params, feats, rng=rng)
        logits = self._logits(params, v, speaker_ids)
        bce = optax.sigmoid_binary_cross_entropy(logits, y)  # [B,T',F,S]
        l = jnp.sum(bce * w[..., None]) / jnp.maximum(
            jnp.sum(w) * y.shape[-1], 1.0
        )
        return l, {"l41_loss": l}

    def loss_from_batch(self, params: dict, batch: dict, rng=None):
        return self.loss(params, batch["sources"], batch["speaker_ids"], rng=rng)

    def separate(
        self,
        params: dict,
        mix: jnp.ndarray,
        speaker_ids: jnp.ndarray | None = None,
        kmeans_iters: int = 10,
        frame_mask: jnp.ndarray | None = None,
    ):
        """Enrolled path: soft sigmoid masks from known speaker centroids.
        Blind path (speaker_ids None): k-means over embeddings, as DPCL."""
        c = self.cfg
        length = mix.shape[-1]
        codes, aux = self.front.encode(params["front"], mix)
        feats = self.front.features(params["front"], codes)
        v = self.embed(params, feats, frame_mask)
        if speaker_ids is not None:
            masks = jax.nn.sigmoid(self._logits(params, v, speaker_ids))
        else:
            b = v.shape[0]
            w = vad_weights(codes, c.vad_threshold_db)
            if frame_mask is not None:
                w = w * frame_mask[..., None]
            _, assign = kmeans(
                v.reshape(b, -1, c.sep.embed_dim),
                k=c.nb_speakers,
                iters=kmeans_iters,
                weights=w.reshape(b, -1),
            )
            masks = _one_hot_last(assign, c.nb_speakers, codes.dtype).reshape(
                *codes.shape, c.nb_speakers
            )
        return self.apply_masks_and_decode(params, codes, aux, masks, length)
