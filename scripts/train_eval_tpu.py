"""Train config-1 DPCL on the synthetic corpus ON TPU, then evaluate SI-SDRi.

WSJ0-2mix cannot be downloaded in this environment (no egress), so this is the
quality-proof run on the synthetic multi-speaker corpus: distinct-f0 harmonic
"speakers" (data/synthetic.py).  Prints a JSON summary; writes the run dir
under runs/ so `cli evaluate` can re-score it.

Usage: python scripts/train_eval_tpu.py [--steps 3000] [--recipe c1|c4|...]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--recipe", default="c1")
    ap.add_argument("--corpus", default="/tmp/amss_corpus")
    ap.add_argument("--workdir", default="runs")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--n-eval", type=int, default=32)
    ap.add_argument("--pretrained-front", default=None)
    args = ap.parse_args()

    from amss_tpu.configs.recipes import ALL_RECIPES
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.data.synthetic import make_synthetic_corpus
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator
    from amss_tpu.train.engine import Trainer

    if not os.path.exists(os.path.join(args.corpus, "manifest.json")):
        make_synthetic_corpus(args.corpus, n_speakers=30, seconds_per_speaker=40.0)
    store = SpeakerStore(args.corpus)

    kwargs = {}
    if args.recipe == "c3":
        kwargs["n_train_speakers"] = len(store.speakers)
    if args.recipe == "c2" and args.pretrained_front:
        kwargs["pretrained_front"] = args.pretrained_front
    recipe = ALL_RECIPES[args.recipe](**kwargs)
    recipe = dataclasses.replace(
        recipe,
        train=dataclasses.replace(
            recipe.train,
            steps=args.steps,
            batch_size=args.batch_size,
            valid_every=max(args.steps // 10, 1),
        ),
    )

    tr = Trainer(recipe, store, workdir=args.workdir)
    print(f"run dir: {tr.dir}", flush=True)
    t0 = time.time()
    state = tr.fit()
    train_s = time.time() - t0
    print(f"trained {args.steps} steps in {train_s:.0f}s "
          f"({args.steps/train_s:.1f} steps/s)", flush=True)

    # --- eval on held-out test-split mixtures -------------------------------
    mixes, refs = [], []
    for i in range(args.n_eval):
        hb = tr.mixer.batch("test", i, 1)
        refs.append(hb.sources[0])
        mixes.append(hb.sources[0].sum(0))
    sep = StreamingSeparator(tr.model, state["params"], sample_rate=recipe.sample_rate)
    t0 = time.time()
    est = sep.separate_all(mixes)
    out = evaluate_separation(np.stack(est), np.stack(refs), np.stack(mixes))
    out.update(
        recipe=args.recipe,
        steps=args.steps,
        train_seconds=round(train_s, 1),
        steps_per_sec=round(args.steps / train_s, 2),
        rtf=round(sep.meter.rtf, 5),
        utterances_per_sec=round(sep.meter.utterances_per_sec, 2),
        run_dir=tr.dir,
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
