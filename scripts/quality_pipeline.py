"""Full quality pipeline on TPU: train + evaluate every judged config on the
synthetic corpus, chained so the chip stays busy.  Emits one JSON line per
stage into quality_results.jsonl (and stdout).

Stages:
  c1   STFT+DPCL (E=40, 10k steps)        -> SI-SDRi vs IBM oracle
  enh  second-stage refinement on c1      -> SI-SDRi
  c2p  adapt autoencoder pretrain (2k)
  c2   adapt front + DPCL finetune (6k)   -> SI-SDRi (partial restore path)
  c3   L41 enrolled centroids (6k)        -> SI-SDRi (enrolled masks)
  c4   Chimera 3-speaker (6k)             -> SI-SDRi (MI soft masks)
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


def sized(recipe, steps, batch=16, embed=None, hidden=None):
    t = dataclasses.replace(
        recipe.train, steps=steps, batch_size=batch,
        valid_every=max(steps // 5, 1),
    )
    sep = recipe.model.sep
    if embed:
        sep = dataclasses.replace(sep, embed_dim=embed)
    if hidden:
        sep = dataclasses.replace(sep, hidden=hidden)
    return dataclasses.replace(
        recipe, train=t, model=dataclasses.replace(recipe.model, sep=sep)
    )


def evaluate(trainer, state, n=32, speaker_aware=False):
    import jax.numpy as jnp

    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator

    mixes, refs, sids = [], [], []
    # Enrolled (speaker-aware) evaluation needs speakers whose centroids were
    # trained, i.e. train-split speakers at UNSEEN chunk offsets (the L41
    # closed-speaker-set setting); blind eval uses the disjoint test split.
    split, offset = ("train", 10_000_000) if speaker_aware else ("test", 0)
    for i in range(n):
        hb = trainer.mixer.batch(split, offset + i, 1)
        refs.append(hb.sources[0])
        mixes.append(hb.sources[0].sum(0))
        sids.append(hb.speaker_ids[0])
    kw = {}
    sep = StreamingSeparator(trainer.model, state["params"],
                             separate_kwargs=kw)
    if speaker_aware:
        # enrolled path: direct batched separate with known speaker ids
        import jax

        fn = jax.jit(lambda p, m, s: trainer.model.separate(p, m, speaker_ids=s))
        t0 = time.perf_counter()
        est = np.asarray(fn(state["params"], jnp.asarray(np.stack(mixes)),
                            jnp.asarray(np.stack(sids))))
        dt = time.perf_counter() - t0
        out = evaluate_separation(est, np.stack(refs), np.stack(mixes))
        out["rtf"] = dt / (n * len(mixes[0]) / 8000.0)
        return out
    est = sep.separate_all(mixes)
    out = evaluate_separation(np.stack(est), np.stack(refs), np.stack(mixes))
    out["rtf"] = sep.meter.rtf
    return out


def main():
    from amss_tpu.configs.recipes import (
        c1_stft_dpcl,
        c2_adapt_dpcl,
        c2_pretrain_adapt,
        c3_l41,
        c4_chimera_3mix,
        c6_tasnet,
        enh_dpcl,
    )
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.data.synthetic import make_synthetic_corpus
    from amss_tpu.train.engine import Trainer

    corpus = "/tmp/amss_corpus"
    if not os.path.exists(os.path.join(corpus, "manifest.json")):
        make_synthetic_corpus(corpus, n_speakers=30, seconds_per_speaker=40.0)
    store = SpeakerStore(corpus)

    def run(name, recipe, n_eval=32, speaker_aware=False):
        tr = Trainer(recipe, store, workdir="runs")
        t0 = time.time()
        state = tr.fit()
        out = evaluate(tr, state, n=n_eval, speaker_aware=speaker_aware)
        out.update(stage=name, steps=recipe.train.steps,
                   train_seconds=round(time.time() - t0, 1), run_dir=tr.dir)
        log_result(out)
        return tr

    # 1. flagship DPCL
    tr1 = run("c1_dpcl_e40", sized(c1_stft_dpcl(), 10000, embed=40))

    # 2. enhancement on top
    run("enh_on_c1", sized(enh_dpcl(base_run=tr1.dir), 3000))

    # 3. adapt pretrain -> finetune
    trp = Trainer(sized(c2_pretrain_adapt(), 2000), store, workdir="runs")
    trp.fit()
    log_result({"stage": "c2_pretrain", "run_dir": trp.dir})
    run("c2_adapt_dpcl", sized(c2_adapt_dpcl(pretrained_front=trp.dir), 6000,
                               embed=40))

    # 4. L41 enrolled
    run("c3_l41", sized(c3_l41(n_train_speakers=len(store.speakers)), 6000),
        speaker_aware=True)

    # 5. chimera 3-speaker
    run("c4_chimera", sized(c4_chimera_3mix(), 6000, embed=40))

    # 6. TasNet flagship (waveform PIT, adaptive front end-to-end)
    run("c6_tasnet", sized(c6_tasnet(), 12000))

    print("QUALITY PIPELINE DONE", flush=True)


if __name__ == "__main__":
    main()
