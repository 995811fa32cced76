"""Learned-front (c2) quality experiments on TPU.

The round-1 baseline (adapt front + DPCL + k-means) reached only +1.6 dB
SI-SDRi vs +7.3 dB for STFT.  Hypotheses tested here:

  A. chimera+adapt: the MI head's soft masks avoid clustering the learned
     code space entirely (k-means geometry may be the weak link).
  B. dpcl+adapt with pool=1: the argmax max-pool halves time resolution and
     scrambles phase-bearing sign structure; drop it.
  C. chimera+adapt pool=1: both.

Each variant: pretrain the front briefly (reconstruction), then train with
the pretrained front restored.  Results appended to quality_results.jsonl.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "quality_results.jsonl")


def log_result(rec):
    rec["time"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    from amss_tpu.configs.recipes import _SEP
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.data.synthetic import make_synthetic_corpus
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator
    from amss_tpu.train.engine import Trainer
    from amss_tpu.utils.cache import enable_compilation_cache
    from amss_tpu.utils.config import (
        FrontConfig,
        ModelConfig,
        RecipeConfig,
        TrainConfig,
    )

    enable_compilation_cache()
    corpus = "/tmp/amss_corpus"
    if not os.path.exists(os.path.join(corpus, "manifest.json")):
        make_synthetic_corpus(corpus, n_speakers=30, seconds_per_speaker=40.0)
    store = SpeakerStore(corpus)

    def front(pool):
        return FrontConfig(kind="adapt", n_filters=256, filter_len=256,
                           stride=64, pool=pool)

    def run(name, kind, pool, steps=6000, pre_steps=1500):
        pre = RecipeConfig(
            name=f"{name}_pre",
            model=ModelConfig(kind="adapt_ae", front=front(pool), sep=_SEP),
            train=TrainConfig(steps=pre_steps, batch_size=16,
                              valid_every=pre_steps),
        )
        trp = Trainer(pre, store, workdir="runs_c2")
        trp.fit()

        rec = RecipeConfig(
            name=name,
            model=ModelConfig(kind=kind, front=front(pool), sep=_SEP,
                              nb_speakers=2, recon_weight=0.2 if kind == "dpcl" else 0.0),
            train=TrainConfig(steps=steps, batch_size=16, lr=3e-4,
                              valid_every=steps // 4),
            pretrained_front=trp.dir,
            freeze_front_steps=200,
        )
        tr = Trainer(rec, store, workdir="runs_c2")
        t0 = time.time()
        state = tr.fit()
        mixes, refs = [], []
        for i in range(32):
            hb = tr.mixer.batch("test", i, 1)
            refs.append(hb.sources[0])
            mixes.append(hb.sources[0].sum(0))
        sep = StreamingSeparator(tr.model, state["params"])
        est = sep.separate_all(mixes)
        out = evaluate_separation(np.stack(est), np.stack(refs), np.stack(mixes))
        out.update(stage=name, rtf=sep.meter.rtf,
                   train_seconds=round(time.time() - t0, 1), run_dir=tr.dir)
        log_result(out)

    run("c2A_chimera_adapt_p2", "chimera", pool=2)
    run("c2B_dpcl_adapt_p1", "dpcl", pool=1)
    run("c2C_chimera_adapt_p1", "chimera", pool=1)
    print("C2 VARIANTS DONE", flush=True)


if __name__ == "__main__":
    main()
