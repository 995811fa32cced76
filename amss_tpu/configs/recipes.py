"""Recipe instances.  Sizes follow the reference's hyperparameter regime
(SURVEY.md §2.3, §2.5): 2-layer x 300-unit BLSTM, E=20-40 embeddings,
win/hop 256/64 @ 8 kHz; scale up via CLI overrides (amss_tpu/cli.py)."""

from __future__ import annotations

from amss_tpu.utils.config import (
    FrontConfig,
    ModelConfig,
    RecipeConfig,
    SeparatorConfig,
    TrainConfig,
)

_STFT = FrontConfig(kind="stft", win=256, hop=64)
_ADAPT = FrontConfig(kind="adapt", n_filters=256, filter_len=256, stride=64, pool=2)
_SEP = SeparatorConfig(hidden=300, layers=2, embed_dim=20)


def c1_stft_dpcl(**over) -> RecipeConfig:
    """Config 1 (BASELINE.json:7): STFT + BLSTM deep clustering, 2 speakers,
    single 8 s utterance capable (64000 samples @ 8 kHz on one chip)."""
    return RecipeConfig(
        name="c1_stft_dpcl",
        model=ModelConfig(kind="dpcl", front=_STFT, sep=_SEP, nb_speakers=2),
        train=TrainConfig(**{"batch_size": 8, "chunk_samples": 16384, **over}),
    )


def c2_pretrain_adapt(**over) -> RecipeConfig:
    """Config 2 prerequisite (SURVEY.md §3.1): adaptive filterbank autoencoder
    pretraining on clean speech reconstruction."""
    return RecipeConfig(
        name="c2_pretrain_adapt",
        model=ModelConfig(kind="adapt_ae", front=_ADAPT, sep=_SEP, nb_speakers=2),
        train=TrainConfig(**{"batch_size": 8, "chunk_samples": 16384, "lr": 1e-3, **over}),
    )


def c2_adapt_dpcl(pretrained_front: str | None = None, **over) -> RecipeConfig:
    """Config 2 (BASELINE.json:8): learned adaptive front + deep clustering,
    end-to-end finetune with the pretrained front restored (SURVEY.md §3.3)."""
    return RecipeConfig(
        name="c2_adapt_dpcl",
        model=ModelConfig(
            kind="dpcl", front=_ADAPT, sep=_SEP, nb_speakers=2, recon_weight=0.2
        ),
        train=TrainConfig(**{"batch_size": 8, "chunk_samples": 16384, "lr": 3e-4, **over}),
        pretrained_front=pretrained_front,
        freeze_front_steps=200 if pretrained_front else 0,
    )


def c3_l41(n_train_speakers: int, **over) -> RecipeConfig:
    """Config 3 (BASELINE.json:9): L41 speaker-centroid attractor masks with
    enrolled speaker embeddings."""
    return RecipeConfig(
        name="c3_l41",
        model=ModelConfig(
            kind="l41",
            front=_STFT,
            sep=_SEP,
            nb_speakers=2,
            n_train_speakers=n_train_speakers,
        ),
        train=TrainConfig(**{"batch_size": 8, "chunk_samples": 16384, **over}),
    )


def c4_chimera_3mix(**over) -> RecipeConfig:
    """Config 4 (BASELINE.json:10): Chimera multitask DC+MI heads, 3-speaker."""
    return RecipeConfig(
        name="c4_chimera_3mix",
        model=ModelConfig(
            kind="chimera", front=_STFT, sep=_SEP, nb_speakers=3, chimera_alpha=0.5
        ),
        train=TrainConfig(**{"batch_size": 8, "chunk_samples": 16384, **over}),
    )


def c5_streaming(**over) -> RecipeConfig:
    """Config 5 (BASELINE.json:11): model for the bucketed streaming-inference
    path (infer/streaming.py exercises it; training config == c1)."""
    return RecipeConfig(
        name="c5_streaming",
        model=ModelConfig(kind="dpcl", front=_STFT, sep=_SEP, nb_speakers=2),
        train=TrainConfig(**{"batch_size": 8, "chunk_samples": 16384, **over}),
    )


def c6_tasnet(**over) -> RecipeConfig:
    """TasNet-style end-to-end separation (beyond-reference model family):
    short-window adaptive filterbank + trunk + sigmoid masks, trained on
    waveform PIT SI-SDR.  The strongest blind path in this repo — published
    lineage reaches 15+ dB SI-SDRi on WSJ0-2mix.

    Default trunk is the Conv-TasNet-style TCN (X=8 dilation ladder, R=3),
    the best-measured blind config (PARITY.md round-2 ladder: +9.30 dB
    SI-SDRi / +10.23 SDRi v2test, beating dual-path +8.56 at equal steps)
    and the fastest (feed-forward, MXU-dominated).  `--trunk dprnn
    --blocks 6` restores the dual-path variant."""
    return RecipeConfig(
        name="c6_tasnet",
        model=ModelConfig(
            kind="tasnet",
            front=FrontConfig(
                kind="adapt", n_filters=256, filter_len=32, stride=16, pool=1
            ),
            sep=SeparatorConfig(
                hidden=128, layers=2, embed_dim=20, trunk="tcn", blocks=8,
                repeats=3, chunk_frames=32, dropout=0.0,
            ),
            nb_speakers=2,
        ),
        train=TrainConfig(
            **{"batch_size": 8, "chunk_samples": 16384, "lr": 1e-3,
               "lr_schedule": "cosine", **over}
        ),
    )


def c7_realtime(**over) -> RecipeConfig:
    """Causal low-latency TasNet (beyond-reference): causal TCN trunk +
    cumulative input norm, separable in fixed-size chunks with EXACT equality
    to offline separation (infer/realtime.py).  Algorithmic latency =
    chunk + (filter_len - stride) samples (2 ms decoder lookahead at 8 kHz)."""
    return RecipeConfig(
        name="c7_realtime",
        model=ModelConfig(
            kind="tasnet",
            front=FrontConfig(
                kind="adapt", n_filters=256, filter_len=32, stride=16, pool=1
            ),
            sep=SeparatorConfig(
                hidden=128, embed_dim=20, trunk="tcn", blocks=8, repeats=2,
                causal=True, feature_norm="cumulative",
            ),
            nb_speakers=2,
        ),
        train=TrainConfig(**{"batch_size": 8, "chunk_samples": 16384, "lr": 1e-3, **over}),
    )


def enh_dpcl(base_run: str | None = None, **over) -> RecipeConfig:
    """Enhancement/refinement stage (SURVEY.md §2.5 recipe 4, Isik et al.
    second-stage): small BLSTM refines a frozen base separator's estimates.

    Refine CLUSTERING bases (dpcl/l41/chimera) only: measured round 2, the
    stage regresses waveform-trained TasNet bases in both objectives (base
    +9.87 dB -> +8.70 msa / +9.23 sisdr v2test) — EnhancerModel warns when
    pointed at one (quality_results.jsonl enh_on_tasnet rows)."""
    return RecipeConfig(
        name="enh_dpcl",
        model=ModelConfig(
            kind="enhance",
            front=_STFT,
            sep=SeparatorConfig(hidden=128, layers=1, embed_dim=20),
            nb_speakers=2,
        ),
        train=TrainConfig(**{"batch_size": 8, "chunk_samples": 16384, "lr": 3e-4, **over}),
        base_run=base_run,
    )


ALL_RECIPES = {
    "c1": c1_stft_dpcl,
    "c2_pretrain": c2_pretrain_adapt,
    "c2": c2_adapt_dpcl,
    "c3": c3_l41,
    "c4": c4_chimera_3mix,
    "c5": c5_streaming,
    "c6": c6_tasnet,
    "c7": c7_realtime,
    "enh": enh_dpcl,
}
