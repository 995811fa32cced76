"""Low-latency streaming separation for the causal TasNet-TCN (c7).

Beyond-reference capability (the reference separated whole utterances
offline; cf. the driver-retrieved low-latency deep-clustering context paper,
PAPERS.md): audio arrives in fixed-size chunks and separated audio leaves
after every chunk, with

    algorithmic latency = chunk length + (filter_len - stride) samples
                         (the decoder's overlap-add lookahead, 2 ms for c7)

and EXACT equality with full-utterance separation (bit-level on CPU, tested
in tests/test_realtime.py; on the TPU the two paths compile to differently
tiled kernels, leaving ~1e-3 accumulation-order noise — measured 4.4e-3 max
err on-chip).  Exactness comes from three causal-by-construction pieces:

  * causal TCN trunk (models/tcn.py, sep.causal) — frame t reads frames <= t
    within a finite receptive field R, so recomputing a sliding window of
    R + hop frames reproduces full-utterance activations exactly;
  * cumulative input norm (models/front.py::cumulative_norm) — frame t is
    normalized by running stats of frames <= t; the stats of frames that
    scroll out of the window are carried as (count, sum, sumsq) and seed the
    next window, so no information is lost to truncation;
  * causal learned smoothing in the adaptive front — the window keeps
    smooth_len - 1 warm-up frames whose outputs are discarded.

Everything per push is ONE jit program with static shapes (compiled once):
encode -> features -> seeded cumulative norm -> causal TCN -> masks ->
decode+OLA of just the frames whose output samples are fully determined.
The host keeps only a raw-sample ring and three scalar carry stats.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.models.blstm import dense
from amss_tpu.models.front import cumulative_norm
from amss_tpu.models.tcn import receptive_field_frames, tcn_stack


class RealtimeSeparator:
    """Push fixed-size chunks of a mixture; pull separated chunks.

    Use `separate_stream(wave)` for the whole-utterance convenience path
    (pads the tail, trims outputs) — bit-exact vs `model.separate` (tested in
    tests/test_realtime.py).
    """

    def __init__(self, model, params, chunk_samples: int = 4096,
                 history_frames: int | None = None, sample_rate: int = 8000):
        c = model.cfg
        f, s = c.front, c.sep
        if not (s.trunk == "tcn" and s.causal):
            raise ValueError("RealtimeSeparator needs sep.trunk='tcn' + causal")
        if s.feature_norm != "cumulative":
            raise ValueError("RealtimeSeparator needs feature_norm='cumulative'")
        if f.kind != "adapt" or f.pool != 1:
            raise ValueError("RealtimeSeparator needs an adapt front with pool=1")
        if f.filter_len % f.stride != 0:
            raise ValueError("filter_len must be a multiple of stride")
        if chunk_samples % f.stride != 0:
            raise ValueError("chunk_samples must be a multiple of stride")
        # (sep.dropout needs no check: the eval path passes no rng, and
        # dropout without an rng is identity.)
        self.model, self.params = model, params
        self.c = chunk_samples
        self.stride = f.stride
        self.ls = f.filter_len // f.stride
        self.hop = chunk_samples // f.stride
        self.lead = f.smooth_len - 1
        rf = history_frames if history_frames is not None else (
            receptive_field_frames(s.blocks, s.repeats, s.kernel)
        )
        self.ld = self.hop + self.ls - 1  # decode slice (emitted + ls-1 older)
        # every decode-slice frame needs its full causal receptive field
        # in-window, so the window covers rf + ld kept frames
        self.tw = rf + self.ld
        # encoder window: (tw + lead) frames -> samples
        self.w_ext = (self.tw + self.lead - 1) * f.stride + f.filter_len

        self.sample_rate = sample_rate
        self.n_spk = c.nb_speakers
        self._buf = np.zeros(self.w_ext, np.float32)
        self._carry = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        self._pushes = 0
        self._step = jax.jit(self._make_step())
        self._compiled = False  # first push ever pays the XLA compile
        self._timed_pushes = 0  # post-compile pushes, across ALL streams
        self.compile_seconds = 0.0
        self.compute_seconds = 0.0

    # ------------------------------------------------------------------ jit
    def _make_step(self):
        model, cfg = self.model, self.model.cfg
        lead, tw, hop, ld, ls = self.lead, self.tw, self.hop, self.ld, self.ls
        stride, c_samp, n_spk = self.stride, self.c, self.n_spk
        feat_dim = cfg.front.feature_dim
        # honor the model's compute dtype so streamed == offline holds for
        # bf16-configured models too
        compute_dtype = model._compute_dtype()

        def step(params, window, mask, codes_mask, dec_mask, carry):
            # window [1, w_ext]; mask [1, tw] 1=real frame (global index >= 0);
            # codes_mask [1, tw+lead] same incl. smoothing warm-up positions;
            # dec_mask [1, ld] same for the decode slice; carry 3 scalars
            front = model.front
            codes, aux = front.encode(params["front"], window)  # [1, tw+lead, N]
            # Prehistory frames straddle the stream start (their analysis
            # window reads real samples through the zero-prepadded buffer) but
            # do not exist offline — zero them so the causal smoothing of the
            # first real frames sees the same zeros offline padding provides.
            codes = codes * codes_mask[..., None]
            feats_all = front.features(params["front"], codes)
            feats = feats_all[:, lead:]  # drop smoothing warm-up frames
            normed, _ = cumulative_norm(feats, mask, carry=carry)
            # stats of the hop frames that scroll out of the kept window
            v = mask[..., None]
            leave = feats[:, :hop] * v[:, :hop]
            leave_stats = (
                carry[0] + jnp.sum(v[:, :hop]) * feat_dim,
                carry[1] + jnp.sum(leave),
                carry[2] + jnp.sum(leave * leave),
            )
            h = tcn_stack(
                params["separator"]["tcn"], normed, mask=mask,
                blocks_per_repeat=cfg.sep.blocks,
                compute_dtype=compute_dtype, causal=True,
            )
            m = jax.nn.sigmoid(
                dense(params["separator"]["proj_mask"], h, compute_dtype)
            ).reshape(1, tw, feat_dim, n_spk)
            # decode only the frames whose emitted samples are determined
            a = lead + tw - ld
            aux_s = {
                "sign": aux["sign"][:, a : a + ld],
                "idx": aux["idx"][:, a : a + ld],
                "t_frames": ld,
            }
            # prehistory frames straddle the stream start (they read some real
            # samples through the zero-padded buffer) but do not exist in the
            # full-utterance computation — zero their decode contribution.
            codes_s = codes[:, a : a + ld] * dec_mask[..., None]
            outs = []
            for si in range(n_spk):
                zc = codes_s * m[:, tw - ld :, :, si]
                y = front.decode(
                    params["front"], zc, aux_s, length=(ld - 1) * stride + cfg.front.filter_len
                )
                outs.append(y[:, (ls - 1) * stride : (ls - 1) * stride + c_samp])
            return jnp.stack(outs, axis=1)[0], leave_stats  # [S, C], carry'

        return step

    # ----------------------------------------------------------------- host
    def reset(self) -> None:
        """Start a new stream: clear the sample buffer, carried norm stats and
        push counter (the jit cache and RTF meter persist).  Required between
        utterances — carried state belongs to ONE stream."""
        self._buf = np.zeros(self.w_ext, np.float32)
        self._carry = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        self._pushes = 0

    def push(self, chunk: np.ndarray, end_frame: int | None = None) -> np.ndarray:
        """chunk [c] mixture samples -> [S, c] separated samples (the stream
        lags the input by filter_len - stride samples).

        end_frame: total frame count of the finite utterance, when known —
        zero-padded tail frames past it are excluded from decode so the last
        samples match full-utterance separation exactly (separate_stream
        passes it; a true infinite stream leaves it None)."""
        assert chunk.shape == (self.c,)
        self._buf = np.concatenate([self._buf[self.c :], chunk.astype(np.float32)])
        # Kept frame p has global index g = p + k*hop - tw + 1 - ls (k = pushes
        # incl. this one); frames with g < 0 predate the stream -> masked.
        k = self._pushes + 1
        g0 = k * self.hop - self.tw + 1 - self.ls
        pre = max(0, min(self.tw, -g0))
        mask = np.ones((1, self.tw), np.float32)
        mask[:, :pre] = 0.0
        # codes position j has global frame index g0 - lead + j
        codes_mask = np.ones((1, self.tw + self.lead), np.float32)
        codes_mask[:, : max(0, min(self.tw + self.lead, self.lead - g0))] = 0.0
        dec_mask = mask[:, self.tw - self.ld :].copy()
        if end_frame is not None:
            g_dec0 = k * self.hop - self.ld + 1 - self.ls
            cut = max(0, min(self.ld, end_frame - g_dec0))
            dec_mask[:, cut:] = 0.0
        t0 = time.perf_counter()
        est, self._carry = self._step(
            self.params, jnp.asarray(self._buf)[None], jnp.asarray(mask),
            jnp.asarray(codes_mask), jnp.asarray(dec_mask), self._carry
        )
        out = np.asarray(est)  # host fetch = sync point
        dt = time.perf_counter() - t0
        if not self._compiled:
            self.compile_seconds += dt
            self._compiled = True
        else:
            self.compute_seconds += dt
            self._timed_pushes += 1
        self._pushes += 1
        return out

    def separate_stream(self, wave: np.ndarray) -> np.ndarray:
        """Whole-utterance convenience: stream `wave` through push() and
        return [S, len(wave)] — exactly model.separate's output.  Resets any
        previous stream state first (safe to call per utterance)."""
        self.reset()
        t = len(wave)
        lag = (self.ls - 1) * self.stride
        n_chunks = -(-(t + lag) // self.c)
        padded = np.zeros(n_chunks * self.c, np.float32)
        padded[:t] = wave
        nf = self.model.cfg.front.frames_for(t)
        outs = [self.push(padded[i * self.c : (i + 1) * self.c], end_frame=nf)
                for i in range(n_chunks)]
        full = np.concatenate(outs, axis=-1)  # [S, n_chunks*c], lags by `lag`
        return full[:, lag : lag + t]

    @property
    def rtf(self) -> float:
        """Compute-only real-time factor over everything pushed so far,
        across all streams (first-push compile excluded; serving reuses the
        cache)."""
        audio_s = self._timed_pushes * self.c / self.sample_rate
        return self.compute_seconds / audio_s if audio_s else float("inf")
