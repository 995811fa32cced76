"""Enhancement / refinement stage (second-stage network).

Capability parity: the reference's enhancement recipe (SURVEY.md §2.5 trainer
row: "(4) enhancement/refinement stage"; §3.1-3.3 recipe family), after the
DPCL+ second-stage enhancement of Isik et al. 2016 (SURVEY.md §2.9): a frozen
base separator produces first-pass estimates; a small BLSTM sees
[mix features ; estimate features] per source and predicts a RESIDUAL logit
correction to the base's implied mask (softmax over sources), identity at
init — it can only improve on the first pass where the loss asks it to.

TPU design: the per-source refinement folds sources into the batch axis
(B·S rows through one BLSTM — bigger MXU batches, no per-source loop), and
the frozen base runs under stop_gradient inside the same jit program, so the
whole two-stage pipeline stays device-resident.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amss_tpu.models.base import SeparatorBase, _EPS
from amss_tpu.models.blstm import _init_dense, dense, init_blstm_stack, blstm_stack
from amss_tpu.models.chimera import msa_pit_loss
from amss_tpu.models.front import instance_norm, vad_weights
from amss_tpu.utils.config import ModelConfig


class EnhancerModel:
    """Refines a frozen base separator's estimates."""

    def __init__(self, cfg: ModelConfig, base_model, base_params):
        assert cfg.kind == "enhance"
        # Adopt the BASE's front config wholesale: everything downstream that
        # reads cfg.front (StreamingSeparator's frames_for, frame masks, RTF
        # bucketing) must see the front that actually runs — the base chain's
        # — not the enhance recipe's default (an STFT/adapt mismatch used to
        # surface as a broadcast error deep inside separate()).
        import dataclasses as _dc

        if cfg.front != base_model.cfg.front:
            import warnings

            warnings.warn(
                f"enhance recipe front ({cfg.front.kind}, "
                f"feature_dim={cfg.front.feature_dim}) differs from base "
                f"run's ({base_model.cfg.front.kind}, "
                f"feature_dim={base_model.cfg.front.feature_dim}); "
                "using the base's front."
            )
        self.cfg = _dc.replace(cfg, front=base_model.cfg.front)
        cfg = self.cfg
        if base_model.cfg.kind == "tasnet":
            # Measured round 2 (quality_results.jsonl enh_on_tasnet /
            # enh_sisdr_on_tasnet): stacking enhancement on a waveform-trained
            # TasNet base REGRESSED it in both objectives (9.87 -> 8.70 msa,
            # -> 9.23 sisdr v2test) — the residual-mask stage helps clustering
            # bases (dpcl/l41/chimera), whose masks it was designed to refine.
            import warnings

            warnings.warn(
                "enhancement over a waveform-trained (tasnet) base measurably "
                "REGRESSES it (round-2: base +9.87 dB -> enh +8.70/+9.23); "
                "refine clustering bases (dpcl/l41/chimera) only",
                stacklevel=2,
            )
        self.base = base_model
        self.base_params = jax.tree_util.tree_map(jax.lax.stop_gradient, base_params)
        self.front = base_model.front  # same analysis front as the base
        # The refiner is sized from the BASE's front (self.front.cfg), not the
        # enhance recipe's own cfg.front: runtime features always come from the
        # base chain, so a recipe/base front mismatch must not produce an
        # opaque shape error downstream.
        self.feature_dim = self.front.cfg.feature_dim
        # Front params live in the base for first-stage bases, but in the
        # base's OWN base when stacking enhancement stages.
        self.front_params = (
            self.base_params["front"]
            if "front" in self.base_params
            else base_model.front_params
        )

    def init(self, key) -> dict:
        c = self.cfg
        kt, kp = jax.random.split(key)
        f = self.feature_dim
        proj = _init_dense(kp, 2 * c.sep.hidden, f, scale=1e-3)  # near-zero delta
        return {
            "separator": {
                "blstm": init_blstm_stack(kt, 2 * f, c.sep.hidden, c.sep.layers),
                "proj": proj,
            }
        }

    def _compute_dtype(self):
        return jnp.bfloat16 if self.cfg.sep.compute_dtype == "bfloat16" else jnp.float32

    def _refined_masks(self, params, mix_codes, est_codes, frame_mask=None):
        """mix_codes [B,T,F], est_codes [B,S,T,F] -> masks [B,T,F,S].

        RESIDUAL refinement: the head emits a per-bin logit DELTA added to the
        base's implied mask logits (log of the first pass's energy share), and
        the result renormalizes over sources.  The delta projection initializes
        near zero, so at init the refined masks EQUAL the base masks — the
        second stage can only move away from the first pass where the loss
        asks it to (fixes the regression the additive-sigmoid design showed on
        strong bases).  frame_mask [B,T] excludes padded frames."""
        b, s, t, f = est_codes.shape
        mixf = jnp.log(mix_codes + _EPS)
        estf = jnp.log(est_codes + _EPS)
        pairs = jnp.concatenate(
            [jnp.broadcast_to(mixf[:, None], estf.shape), estf], axis=-1
        )  # [B, S, T, 2F]
        fm = None
        if frame_mask is not None:
            fm = jnp.broadcast_to(frame_mask[:, None], (b, s, t)).reshape(b * s, t)
        flat = instance_norm(pairs.reshape(b * s, t, 2 * f), fm)
        h = blstm_stack(
            params["separator"]["blstm"],
            flat,
            mask=fm,
            compute_dtype=self._compute_dtype(),
            remat=self.cfg.sep.remat,
        )
        delta = dense(params["separator"]["proj"], h, self._compute_dtype())
        delta = jnp.moveaxis(delta.reshape(b, s, t, f), 1, -1)  # [B, T, F, S]
        base_share = jnp.moveaxis(est_codes, 1, -1)  # [B, T, F, S]
        base_logits = jnp.log(base_share + _EPS)
        return jax.nn.softmax(base_logits + delta, axis=-1)

    def _base_separate_codes(self, mix, frame_mask=None):
        """Frozen first pass: mixture -> (mix codes, aux, est codes [B,S,T,F])."""
        est = self.base.separate(self.base_params, mix, frame_mask=frame_mask)
        est = jax.lax.stop_gradient(est)
        codes, aux = self.front.encode(self.front_params, mix)
        est_codes, _ = self.front.encode(self.front_params, est)
        return codes, aux, est_codes

    def loss(self, params: dict, sources: jnp.ndarray, rng=None):
        mix = jnp.sum(sources, axis=1)
        codes, aux, est_codes = self._base_separate_codes(mix)
        masks = self._refined_masks(params, codes, est_codes)
        # sisdr: refine in the BASE's own objective domain — waveform PIT
        # SI-SDR through the decoder.  Mask-domain regression (msa/psa)
        # measurably REGRESSES waveform-trained (TasNet) bases: the refiner
        # pulls masks toward magnitude targets the base deliberately traded
        # away for SI-SDR (round-2 ladder, enh_on_tasnet rows).
        if self.cfg.loss_variant == "sisdr":
            from amss_tpu.ops.metrics import pit_si_sdr

            masked = jnp.moveaxis(codes[..., None] * masks, -1, 1)
            aux_b = {
                k: (v[:, None] if isinstance(v, jnp.ndarray) else v)
                for k, v in aux.items()
            }
            est = self.front.decode(
                self.front_params, masked, aux_b, sources.shape[-1]
            )
            sdr, _ = pit_si_sdr(est, sources)
            l = -jnp.mean(sdr)
            return l, {"enhance_neg_sisdr": l}
        src_codes, src_aux = self.front.encode(self.front_params, sources)
        w = vad_weights(codes, self.cfg.vad_threshold_db)
        # psa: refine toward phase-sensitive targets (cfg.loss_variant)
        if self.cfg.loss_variant == "psa" and "cos" in aux:
            from amss_tpu.models.front import psa_targets

            ref = psa_targets(codes, aux, src_codes, src_aux)
        else:
            ref = src_codes
        l = msa_pit_loss(masks, codes, ref, w)
        return l, {"enhance_mi": l}

    def loss_from_batch(self, params, batch, rng=None):
        return self.loss(params, batch["sources"])

    def separate(self, params: dict, mix: jnp.ndarray, frame_mask=None):
        """Two-stage: frozen base -> refined soft masks on the mixture."""
        length = mix.shape[-1]
        codes, aux, est_codes = self._base_separate_codes(mix, frame_mask)
        masks = self._refined_masks(params, codes, est_codes, frame_mask)
        masked = jnp.moveaxis(codes[..., None] * masks, -1, 1)
        aux_b = {
            k: (v[:, None] if isinstance(v, jnp.ndarray) else v) for k, v in aux.items()
        }
        return self.front.decode(self.front_params, masked, aux_b, length)
