"""The five driver-judged recipe configs (BASELINE.json:6-12), committed as
code (SURVEY.md §5.6: "they are the judge's checklist").

  c1  STFT front + BLSTM deep clustering, 2-speaker, single 8 s utterance
  c2  learned adaptive filterbank front + deep clustering, 2-speaker
      (prerequisite: c2_pretrain adaptive autoencoder)
  c3  L41 speaker-centroid attractor masks with enrolled speaker embeddings
  c4  Chimera multitask (DC + MI heads), 3-speaker
  c5  batched streaming inference: bucketed variable-length batches,
      on-device k-means + overlap-add (see amss_tpu/infer/streaming.py)
"""

from amss_tpu.configs.recipes import (
    c1_stft_dpcl,
    c2_pretrain_adapt,
    c2_adapt_dpcl,
    c3_l41,
    c4_chimera_3mix,
    c5_streaming,
    ALL_RECIPES,
)
