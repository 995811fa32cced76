"""Shared separator machinery: trunk (norm + BLSTM), targets, mask apply.

Capability parity: the reference's shared separator base class — input
normalization, BLSTM stack builder, per-bin dense projection (SURVEY.md §2.3
row 1).  Everything here is pure-functional over dict param pytrees with the
canonical top-level split {"front": ..., "separator": ...} that partial
restore keys on (SURVEY.md §5.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amss_tpu.models.blstm import init_blstm_stack, blstm_stack, _init_dense, dense
from amss_tpu.models.front import (
    make_front,
    ideal_binary_mask,
    psa_targets,
    vad_weights,
    bin_weights,
    corrupt_mix,
    instance_norm,
)
from amss_tpu.utils.config import ModelConfig

_EPS = 1e-8


class SeparatorBase:
    """Front + BLSTM trunk; subclasses add heads and losses."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.front = make_front(cfg.front)

    # -- params -------------------------------------------------------------
    @property
    def trunk_dim(self) -> int:
        """Width of the trunk's output features (what head projections see)."""
        c = self.cfg.sep
        return c.hidden if c.trunk in ("dprnn", "tcn", "dpt") else 2 * c.hidden

    def init_trunk(self, key) -> dict:
        c = self.cfg
        if c.sep.trunk == "tcn":
            from amss_tpu.models.tcn import init_tcn

            return {
                "tcn": init_tcn(
                    key,
                    c.front.feature_dim,
                    bottleneck=c.sep.hidden,
                    hidden=c.sep.expansion * c.sep.hidden,
                    blocks=c.sep.blocks,
                    repeats=c.sep.repeats,
                    kernel=c.sep.kernel,
                )
            }
        if c.sep.trunk == "dpt":
            from amss_tpu.models.dptransformer import init_dpt

            if c.sep.hidden % c.sep.heads:
                raise ValueError(
                    f"sep.hidden={c.sep.hidden} not divisible by "
                    f"heads={c.sep.heads}"
                )
            return {
                "dpt": init_dpt(
                    key,
                    c.front.feature_dim,
                    d_model=c.sep.hidden,
                    ffn_dim=c.sep.expansion * c.sep.hidden,
                    blocks=c.sep.blocks,
                )
            }
        if c.sep.trunk == "dprnn":
            from amss_tpu.models.dprnn import init_dprnn

            return {
                "dprnn": init_dprnn(
                    key,
                    c.front.feature_dim,
                    d_model=c.sep.hidden,
                    hidden=c.sep.hidden,
                    blocks=c.sep.blocks,
                )
            }
        return {
            "blstm": init_blstm_stack(
                key, c.front.feature_dim, c.sep.hidden, c.sep.layers
            )
        }

    def _compute_dtype(self):
        return jnp.bfloat16 if self.cfg.sep.compute_dtype == "bfloat16" else jnp.float32

    def trunk(
        self,
        sep_params: dict,
        feats: jnp.ndarray,  # [B, T', F] log-compressed
        frame_mask: jnp.ndarray | None = None,  # [B, T']
        rng=None,  # training-time dropout key (None = eval/deterministic)
    ) -> jnp.ndarray:
        if self.cfg.sep.feature_norm == "channel":
            from amss_tpu.models.front import channel_norm

            h = channel_norm(feats, frame_mask)
        elif self.cfg.sep.feature_norm == "cumulative":
            from amss_tpu.models.front import cumulative_norm

            h, _ = cumulative_norm(feats, frame_mask)
        else:
            h = instance_norm(feats, frame_mask)
        if "tcn" in sep_params:
            from amss_tpu.models.tcn import tcn_stack

            return tcn_stack(
                sep_params["tcn"],
                h,
                mask=frame_mask,
                blocks_per_repeat=self.cfg.sep.blocks,
                compute_dtype=self._compute_dtype(),
                remat=self.cfg.sep.remat,
                dropout_rate=self.cfg.sep.dropout,
                rng=rng,
                causal=self.cfg.sep.causal,
            )  # [B, T', bottleneck]
        if "dpt" in sep_params:
            from amss_tpu.models.dptransformer import dpt_stack

            return dpt_stack(
                sep_params["dpt"],
                h,
                mask=frame_mask,
                chunk_frames=self.cfg.sep.chunk_frames,
                heads=self.cfg.sep.heads,
                compute_dtype=self._compute_dtype(),
                remat=self.cfg.sep.remat,
                dropout_rate=self.cfg.sep.dropout,
                rng=rng,
            )  # [B, T', D]
        if "dprnn" in sep_params:
            from amss_tpu.models.dprnn import dprnn_stack

            return dprnn_stack(
                sep_params["dprnn"],
                h,
                mask=frame_mask,
                chunk_frames=self.cfg.sep.chunk_frames,
                compute_dtype=self._compute_dtype(),
                remat=self.cfg.sep.remat,
                dropout_rate=self.cfg.sep.dropout,
                rng=rng,
            )  # [B, T', D]
        return blstm_stack(
            sep_params["blstm"],
            h,
            mask=frame_mask,
            compute_dtype=self._compute_dtype(),
            remat=self.cfg.sep.remat,
            dropout_rate=self.cfg.sep.dropout,
            rng=rng,
            unroll=self.cfg.sep.scan_unroll,
        )  # [B, T', 2H]

    # -- shared pipeline pieces ----------------------------------------------
    def observed_mix(self, sources: jnp.ndarray, rng=None) -> jnp.ndarray:
        """The mixture the model OBSERVES at train time: sum of sources, with
        optional in-graph corruption (train rng given, i.e. not at eval):
        per-source synthetic reverberation (cfg.train_reverb_rt60,
        front.reverberate_sources) then additive noise at a drawn SNR
        (cfg.train_noise_snr_db, front.corrupt_mix).  Loss targets always
        stay the clean/dry sources."""
        c = self.cfg
        if c.train_reverb_rt60 is not None and rng is not None:
            from amss_tpu.models.front import reverberate_sources

            wet = reverberate_sources(
                sources, rng, tuple(c.train_reverb_rt60),
                tuple(c.train_reverb_drr_db),
            )
            mix = jnp.sum(wet, axis=1)
        else:
            mix = jnp.sum(sources, axis=1)
        if c.train_noise_snr_db is not None and rng is not None:
            mix = corrupt_mix(mix, rng, tuple(c.train_noise_snr_db))
        return mix

    def encode_mix_and_sources(self, params: dict, sources: jnp.ndarray,
                               rng=None):
        """Device-side mixing + analysis of mixture and sources.

        sources: [B, S, T].  Returns (mix [B,T], mix codes, aux,
        src codes [B,S,T',F], Y, weights, src aux).  The mixture is formed ON
        DEVICE (BASELINE.json:5): the host ships only per-speaker chunks.
        With cfg.train_noise_snr_db / cfg.train_reverb_rt60 set and a train
        rng given, the observed mixture is corrupted in-graph
        (front.corrupt_mix / front.reverberate_sources) — targets and
        ideal masks stay clean/dry.  With cfg.train_min_speakers set, a
        per-sample active count is drawn and trailing sources are zeroed
        BEFORE mixing and target construction (front.drop_sources) — here
        targets change too: count-diverse clustering training."""
        if self.cfg.train_min_speakers is not None and rng is not None:
            from amss_tpu.models.front import drop_sources

            sources = drop_sources(sources, rng, self.cfg.train_min_speakers)
        mix = self.observed_mix(sources, rng)
        codes, aux = self.front.encode(params["front"], mix)
        src_codes, src_aux = self.front.encode(params["front"], sources)
        y = ideal_binary_mask(src_codes)  # [B, T', F, S]
        w = bin_weights(codes, self.cfg.weight_kind, self.cfg.vad_threshold_db)
        return mix, codes, aux, src_codes, y, w, src_aux

    def mi_targets(self, codes, aux, src_codes, src_aux) -> jnp.ndarray:
        """Regression targets for mask-inference losses: source magnitudes
        (msa) or truncated phase-sensitive targets (psa) when the front
        carries phase (cfg.loss_variant; SURVEY.md §2.3 Chimera row)."""
        if self.cfg.loss_variant == "psa" and "cos" in aux:
            return psa_targets(codes, aux, src_codes, src_aux)
        return src_codes

    def loss_from_batch(self, params: dict, batch: dict, rng=None):
        """Uniform trainer entry point; L41 overrides to use speaker ids.
        ``rng`` drives training-time dropout (None = deterministic)."""
        return self.loss(params, batch["sources"], rng=rng)

    def apply_masks_and_decode(
        self,
        params: dict,
        codes: jnp.ndarray,  # [B, T', F]
        aux: dict,
        masks: jnp.ndarray,  # [B, T', F, S]
        length: int,
    ) -> jnp.ndarray:
        """masked codes per speaker -> waveforms [B, S, T]."""
        masked = jnp.moveaxis(codes[..., None] * masks, -1, 1)  # [B, S, T', F]
        aux_b = {
            k: (v[:, None] if isinstance(v, jnp.ndarray) else v) for k, v in aux.items()
        }
        return self.front.decode(params["front"], masked, aux_b, length)
