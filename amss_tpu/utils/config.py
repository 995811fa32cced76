"""Typed dataclass configs + deterministic run ids.

Capability parity: the reference's argparse hyperparameter bundle whose values
define the run-id/log-dir (SURVEY.md §2.5, §5.6).  Here configs are frozen
dataclasses (hashable, jit-static-friendly); ``run_id`` hashes the config so a
recipe's checkpoints land in a deterministic directory, matching the
reference's hyperparameter-id convention.  The five driver configs
(BASELINE.json:7-11) live in amss_tpu/configs/ as committed instances.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FrontConfig:
    kind: str = "stft"  # "stft" | "adapt"
    # STFT params
    win: int = 256
    hop: int = 64
    # Adaptive filterbank params (kind == "adapt")
    n_filters: int = 256
    filter_len: int = 256
    stride: int = 64
    pool: int = 2
    smooth_len: int = 4  # learned smoothing window (frames)

    @property
    def feature_dim(self) -> int:
        return self.win // 2 + 1 if self.kind == "stft" else self.n_filters

    def frames_for(self, t: int) -> int:
        """Separator-rate frame count for a length-t signal (the single source
        of truth — streaming/masking code must call this, not re-derive)."""
        if self.kind == "stft":
            return 1 + (t - self.win) // self.hop
        nf = 1 + (t - self.filter_len) // self.stride
        return nf // self.pool


@dataclass(frozen=True)
class SeparatorConfig:
    hidden: int = 300
    layers: int = 2
    embed_dim: int = 20
    compute_dtype: str = "float32"  # "bfloat16" on TPU hot path
    remat: bool = True
    # Trunk architecture: "blstm" (reference-style stack, SURVEY.md §2.3) or
    # "dprnn" (dual-path intra/inter-chunk scans — shape, not size, is the
    # lever once a flat BLSTM saturates; also far fewer sequential scan steps
    # on TPU: 2*chunk_frames per block instead of T').
    # "tcn" (Conv-TasNet-style dilated depthwise-separable conv stack — zero
    # sequential steps; the most MXU-friendly trunk, models/tcn.py), or
    # "dpt" (SepFormer-style dual-path transformer — intra/inter-chunk
    # self-attention, zero sequential steps, models/dptransformer.py).
    trunk: str = "blstm"
    chunk_frames: int = 16  # dprnn/dpt intra-chunk length K (frames)
    heads: int = 4  # dpt: attention heads (must divide hidden)
    blocks: int = 6  # dprnn dual-path block count / tcn blocks per repeat
    repeats: int = 2  # tcn: repeats of the dilation ladder
    kernel: int = 3  # tcn: depthwise conv kernel width P
    # tcn: conv-channel expansion H = expansion * hidden (bottleneck).  The
    # canonical Conv-TasNet ratio is 4 (B=128, H=512); 2 is this repo's
    # round-2 default (kept so existing checkpoints restore unchanged).
    expansion: int = 2
    # causal=True (tcn only): left-padded dilated convs — frame t never reads
    # the future; pair with feature_norm="cumulative" for the exact
    # low-latency streaming path (infer/realtime.py).
    causal: bool = False
    dropout: float = 0.0  # dropout rate on block outputs (train only)
    # trunk input normalization: "global" (utterance instance norm) or
    # "channel" (per-filter over time — for learned fronts whose per-filter
    # scales are arbitrary)
    feature_norm: str = "global"
    # blstm only: lax.scan unroll factor for the recurrence.  The BLSTM's
    # serving cost on TPU is sequential-step LATENCY, not FLOPs
    # (headline_bisect_r5); unrolling amortizes the per-step loop overhead.
    # Same math but NOT bit-exact (XLA fuses the unrolled block differently —
    # measured ~3e-8 at unroll>=4), so unlike steps_per_call a non-default
    # value DOES fork the run id; it is primarily a serving-time knob
    # (dc.replace the restored config — checkpointed params are unaffected).
    scan_unroll: int = 1


@dataclass(frozen=True)
class ModelConfig:
    kind: str = "dpcl"  # "dpcl" | "l41" | "chimera"
    front: FrontConfig = field(default_factory=FrontConfig)
    sep: SeparatorConfig = field(default_factory=SeparatorConfig)
    nb_speakers: int = 2
    n_train_speakers: int = 0  # L41 centroid table size (0 = not needed)
    chimera_alpha: float = 0.5  # weight on DC loss in Chimera
    vad_threshold_db: float = 40.0  # bins this far below max are weighted out
    # loss bin weighting: "vad" (binary, classic DPCL) or "magnitude"
    # (magnitude-ratio, DPCL+/Chimera++ style — emphasizes loud bins)
    weight_kind: str = "vad"
    # mask-inference regression target: "msa" (magnitude spectrum approx.),
    # "psa" (truncated phase-sensitive approx., Chimera++) — psa needs a
    # phase-carrying front (stft); learned fronts fall back to msa — or
    # "sisdr" (enhance stage only: waveform PIT SI-SDR through the decoder,
    # the right refinement objective over waveform-trained TasNet bases)
    loss_variant: str = "msa"
    # end-to-end finetune (SURVEY.md §3.3): weight of the waveform-domain
    # mixture-reconstruction term added to the separator loss (learned fronts)
    recon_weight: float = 0.0
    # Training-time noise injection (beyond reference, WHAM!-style): white
    # noise added to the OBSERVED mixture at a per-utterance SNR drawn
    # uniformly from this (lo, hi) dB range; targets stay the clean sources.
    # None = clean mixtures (the reference setting).
    train_noise_snr_db: tuple | None = None
    # Training-time reverberation (beyond reference, WHAMR-style): each source
    # is convolved with its own synthetic RIR (unit direct path + decaying
    # Gaussian tail) before mixing; targets stay the DRY sources, training
    # joint dereverberation + separation.  (lo, hi) RT60 draw in SAMPLES
    # (e.g. (800, 3200) = 0.1-0.4 s @ 8 kHz); None = anechoic (reference).
    train_reverb_rt60: tuple | None = None
    # direct-to-reverb ratio draw (dB) for the synthetic RIR tails
    train_reverb_drr_db: tuple = (0.0, 10.0)
    # Count-diverse training (beyond reference): per-sample active speaker
    # count drawn uniformly from {min..nb_speakers}, the rest zeroed in-graph
    # (front.drop_sources) — trains clustering embeddings whose eigengap
    # encodes the count (infer/count.py).  Clustering kinds (dpcl/chimera)
    # only; None = every sample has exactly nb_speakers (reference setting).
    train_min_speakers: int | None = None


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    chunk_samples: int = 16384  # ~2 s @ 8 kHz
    lr: float = 1e-3
    # "const" or "cosine" (linear warmup over warmup_steps, cosine decay to
    # lr/20 at `steps`)
    lr_schedule: str = "const"
    warmup_steps: int = 500
    grad_clip: float = 5.0
    steps: int = 1000
    valid_every: int = 100
    valid_steps: int = 4
    seed: int = 0
    data_axis: int = 1  # mesh size along "data" (1 = single chip)
    # Device-resident corpus: upload all shards to HBM once (int16); per-step
    # batches are (speaker, start, gain) plans gathered inside the jit step —
    # removes the host->HBM audio transfer that bounds step time.
    device_data: bool = False
    # Gradient accumulation: split each batch into this many microbatches and
    # lax.scan value_and_grad over them inside the one jit step (grads and
    # metrics averaged) — large effective batches at O(batch/accum) activation
    # memory.  Exactly equal to the unaccumulated step (tested), since every
    # loss is a per-utterance mean.
    accum_steps: int = 1
    # Parameter EMA (Polyak averaging): 0.0 = off.  When on, the train step
    # also carries ema_params (updated in-graph, donated); validation, the
    # best-checkpoint metric, and downstream loading (load_model_from_run)
    # use the EMA weights.
    ema_decay: float = 0.0
    # Quality-during-training: every validation also runs the full inference
    # path (separate -> PIT) on one valid batch and logs valid/si_sdri — the
    # quality curve next to the loss curve.  Off by default (separate is
    # much heavier than the loss for clustering models: k-means in-graph).
    valid_quality: bool = False
    # Early stopping: stop after this many consecutive validations without a
    # new best valid loss (0 = off).  ckpt_best already holds the best-on-
    # valid weights, so stopping early loses nothing.
    early_stop_patience: int = 0
    # Run this many optimizer steps inside ONE jitted call (lax.scan over
    # per-step batches stacked [K, B, ...]).  The per-step math is identical
    # to steps_per_call=1 (tested bit-exact on CPU) — this is an execution-
    # shape knob that amortizes the fixed per-call dispatch latency (the
    # axon tunnel pays ~38 ms per jitted call; at ~80 ms/step measured in
    # input_ab, latency — not input bandwidth or compute — bounds step
    # time).  Excluded from the run id: it cannot change the trajectory.
    steps_per_call: int = 1


@dataclass(frozen=True)
class RecipeConfig:
    name: str = "recipe"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    sample_rate: int = 8000
    # end-to-end finetune: path/run-id of a pretrained adapt front to restore
    pretrained_front: str | None = None
    freeze_front_steps: int = 0
    # enhancement stage: run dir of the frozen base separator (its config.json
    # + best checkpoint rebuild the first-pass model)
    base_run: str | None = None


def _as_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def recipe_to_dict(cfg: RecipeConfig) -> dict:
    return _as_dict(cfg)


def recipe_from_dict(d: dict) -> RecipeConfig:
    """Rebuild a RecipeConfig from its asdict form (run-dir config.json)."""
    d = dict(d)
    model = dict(d.pop("model"))
    front = FrontConfig(**model.pop("front"))
    sep = SeparatorConfig(**model.pop("sep"))
    return RecipeConfig(
        model=ModelConfig(front=front, sep=sep, **model),
        train=TrainConfig(**d.pop("train")),
        **d,
    )


def run_id_from_stored(d: dict) -> str:
    """The run id of a config DICT in its stored (run-dir config.json) form.

    This is the stable identity of an existing run dir: config.json is the
    dict that was hashed when the dir was created, so hashing it as stored
    reproduces the id across any later config-schema growth (rebuilding the
    dataclass first would fill in fields that didn't exist then and move the
    hash — this orphaned every pre-round-3 run dir once).

    Fields added after a release additionally get an exclusion rule while
    they cannot affect the model, so FRESH configs keep pre-growth ids too:
    `heads` only shapes the 'dpt' trunk and is dropped otherwise."""
    d = json.loads(json.dumps(d))  # deep copy, JSON-normalized
    sep = d.get("model", {}).get("sep", {})
    if sep.get("trunk") != "dpt":
        sep.pop("heads", None)
    tr = d.get("train", {})
    if tr.get("accum_steps", 1) == 1:  # accum=1 is the identical pre-growth step
        tr.pop("accum_steps", None)
    if not tr.get("ema_decay", 0.0):  # 0.0 = EMA off, pre-growth behavior
        tr.pop("ema_decay", None)
    if not tr.get("valid_quality", False):  # logging-only knob, off = as before
        tr.pop("valid_quality", None)
    if not tr.get("early_stop_patience", 0):  # 0 = off, pre-growth behavior
        tr.pop("early_stop_patience", None)
    # execution-shape knob: identical per-step math at any value (the scan
    # body IS the single step), so it never forks the training trajectory
    tr.pop("steps_per_call", None)
    # scan unroll: default-invariant only (unroll>=4 reorders fusions at the
    # ~1e-8 level, which can fork a long training trajectory — keep non-default
    # values in the hash; pre-growth configs stored no key at all)
    if sep.get("scan_unroll", 1) == 1:
        sep.pop("scan_unroll", None)
    mdl = d.get("model", {})
    if not mdl.get("train_noise_snr_db"):  # None = clean, pre-growth behavior
        mdl.pop("train_noise_snr_db", None)
    if not mdl.get("train_reverb_rt60"):  # None = anechoic, pre-growth behavior
        mdl.pop("train_reverb_rt60", None)
        mdl.pop("train_reverb_drr_db", None)
    if not mdl.get("train_min_speakers"):  # None = fixed count, pre-growth
        mdl.pop("train_min_speakers", None)
    blob = json.dumps(d, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:12]


def run_id(cfg: RecipeConfig) -> str:
    """Deterministic 12-hex id from the full config (reference's hyperparameter
    -id/log-dir convention, SURVEY.md §5.6)."""
    return run_id_from_stored(_as_dict(cfg))
