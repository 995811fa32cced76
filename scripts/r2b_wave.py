"""Round-2b experiment driver: re-establish + extend the round-2 quality
ladder after the /tmp wipe (corpora and runs are regenerated deterministically
— same generator seeds — so numbers are comparable to PARITY.md round-1 rows).

Every stage logs BOTH eval views:
  *_bigtest : test split of the 100-spk x 120 s v2big training corpus
  *_v2test  : the UNCHANGED round-1 v2 test mixtures (30-spk corpus, seed 0)

Usage: python scripts/r2b_wave.py <stage> [...]
Stages are registered in STAGES at the bottom.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "quality_results.jsonl",
)

V1 = "/tmp/amss_corpus"
V2 = "/tmp/amss_corpus_v2"
V2BIG = "/tmp/amss_corpus_v2big"
V2HUGE = "/tmp/amss_corpus_v2huge"


def log_result(rec):
    rec["time"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def ensure_corpora():
    from amss_tpu.data.synthetic import make_synthetic_corpus

    jobs = [
        (V1, dict(n_speakers=30, seconds_per_speaker=40.0, version=1, seed=0)),
        (V2, dict(n_speakers=30, seconds_per_speaker=40.0, version=2, seed=0)),
        (V2BIG, dict(n_speakers=100, seconds_per_speaker=120.0, version=2, seed=1)),
    ]
    for root, kw in jobs:
        if not os.path.exists(os.path.join(root, "manifest.json")):
            print("generating", root, kw, flush=True)
            make_synthetic_corpus(root, **kw)


def blind_eval(model, params, corpus: str, n: int = 32, chunk: int = 16384):
    """Blind (k-means / feed-forward) separation over the disjoint test split
    of `corpus`, using the same deterministic mixture convention as round 1
    (Mixer seed 0, test split, steps 0..n-1, batch 1)."""
    from amss_tpu.data.mixer import Mixer
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator

    mixer = Mixer(SpeakerStore(corpus), nb_speakers=model.cfg.nb_speakers,
                  chunk_samples=chunk, seed=0)
    mixes, refs = [], []
    for i in range(n):
        hb = mixer.batch("test", i, 1)
        refs.append(hb.sources[0])
        mixes.append(hb.sources[0].sum(0))
    sep = StreamingSeparator(model, params)
    est = sep.separate_all(mixes)
    out = evaluate_separation(np.stack(est), np.stack(refs), np.stack(mixes))
    out["rtf"] = sep.meter.rtf
    return out


def train(recipe, corpus: str, workdir: str = "runs_r2b"):
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer

    tr = Trainer(recipe, SpeakerStore(corpus), workdir=workdir)
    t0 = time.time()
    state = tr.fit()
    return tr, state, round(time.time() - t0, 1)


def run_stage(name, recipe, corpus=V2BIG, evals=(("bigtest", V2BIG), ("v2test", V2))):
    tr, state, secs = train(recipe, corpus)
    for tag, ecorp in evals:
        out = blind_eval(tr.model, state["params"], ecorp)
        out.update(stage=f"{name}_{tag}", steps=recipe.train.steps,
                   train_seconds=secs, run_dir=tr.dir)
        log_result(out)
    return tr, state


def sized(recipe, steps, batch=16, lr=None, schedule=None, device_data=False,
          **sep_over):
    t = dataclasses.replace(
        recipe.train, steps=steps, batch_size=batch,
        valid_every=max(steps // 10, 1), device_data=device_data,
        **({"lr": lr} if lr else {}),
        **({"lr_schedule": schedule} if schedule else {}),
    )
    sep = dataclasses.replace(recipe.model.sep, **sep_over) if sep_over else recipe.model.sep
    return dataclasses.replace(
        recipe, train=t, model=dataclasses.replace(recipe.model, sep=sep)
    )


# ---------------------------------------------------------------- stages ---


def stage_tasnet_base():
    """c6 TasNet dual-path (h128, 6 blocks) on the big corpus, 12k steps.
    (Trunk pinned explicitly: c6's DEFAULT became tcn after these rows were
    measured — re-runs must keep producing the DPRNN numbers they name.)"""
    from amss_tpu.configs.recipes import c6_tasnet

    run_stage("tasnet_h128b6_12k",
              sized(c6_tasnet(), 12000, schedule="const",
                    trunk="dprnn", blocks=6))


def stage_tasnet_reg():
    """c6 dual-path with dropout 0.1 + cosine schedule — regularized."""
    from amss_tpu.configs.recipes import c6_tasnet

    run_stage("tasnet_h128b6_d01_cos_12k",
              sized(c6_tasnet(), 12000, schedule="cosine",
                    trunk="dprnn", blocks=6, dropout=0.1))


def stage_tasnet_big():
    """c6 dual-path scaled: h192, 8 blocks, dropout, cosine, 24k steps."""
    from amss_tpu.configs.recipes import c6_tasnet

    run_stage("tasnet_h192b8_d01_cos_24k",
              sized(c6_tasnet(), 24000, schedule="cosine",
                    trunk="dprnn", hidden=192, blocks=8, dropout=0.1))


def stage_tasnet_tcn():
    """c6 with the TCN trunk (Conv-TasNet): X=8 dilation ladder, R=3."""
    from amss_tpu.configs.recipes import c6_tasnet

    run_stage("tasnet_tcn_x8r3_12k",
              sized(c6_tasnet(), 12000, schedule="cosine",
                    trunk="tcn", blocks=8, repeats=3, dropout=0.0))


def stage_c1_ctrl():
    """c1 BLSTM-DPCL control on the big corpus (the round-2 +7.4 dB row)."""
    from amss_tpu.configs.recipes import c1_stft_dpcl

    run_stage("c1_ctrl_big_10k", sized(c1_stft_dpcl(), 10000, embed_dim=40))


def stage_tasnet_tcn_big():
    """Scaled TCN flagship: wider bottleneck, 4 s chunks (the 1530-frame
    receptive field only fits with longer chunks), cosine, 30k steps."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c6_tasnet

    r = sized(c6_tasnet(), 30000, batch=8, schedule="cosine",
              trunk="tcn", blocks=8, repeats=3, hidden=192, dropout=0.0)
    r = dc.replace(r, train=dc.replace(r.train, chunk_samples=32768))
    run_stage("tasnet_tcnbig_h192x8r3_30k_c4s", r)


def stage_tasnet_tcn_huge():
    """Speaker-diversity lever: 250-spk corpus (data, not capacity, moved the
    needle in round 2 — h192/30k matched h128/12k, so scale the corpus)."""
    from amss_tpu.data.synthetic import make_synthetic_corpus

    if not os.path.exists(os.path.join(V2HUGE, "manifest.json")):
        make_synthetic_corpus(V2HUGE, n_speakers=250, seconds_per_speaker=60.0,
                              version=2, seed=2)
    from amss_tpu.configs.recipes import c6_tasnet

    run_stage("tasnet_tcn_x8r3_huge_16k",
              sized(c6_tasnet(), 16000, schedule="cosine",
                    trunk="tcn", blocks=8, repeats=3),
              corpus=V2HUGE,
              evals=(("hugetest", V2HUGE), ("v2test", V2)))


def stage_tasnet_tcn_max():
    """Push the speaker-diversity lever once more: 500 speakers."""
    from amss_tpu.data.synthetic import make_synthetic_corpus

    v2max = "/tmp/amss_corpus_v2max"
    if not os.path.exists(os.path.join(v2max, "manifest.json")):
        make_synthetic_corpus(v2max, n_speakers=500, seconds_per_speaker=40.0,
                              version=2, seed=3)
    from amss_tpu.configs.recipes import c6_tasnet

    run_stage("tasnet_tcn_x8r3_max500_16k",
              sized(c6_tasnet(), 16000),
              corpus=v2max,
              evals=(("maxtest", v2max), ("v2test", V2)))


def stage_psa_ab():
    """VERDICT item 4 A/B: MSA vs PSA targets, Chimera 3-mix + enh-on-c1.
    (Re-establishes the round-2 numbers lost with /tmp.)"""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c1_stft_dpcl, c4_chimera_3mix, enh_dpcl

    for variant in ("msa", "psa"):
        r = sized(c4_chimera_3mix(), 6000)
        r = dc.replace(r, model=dc.replace(r.model, loss_variant=variant))
        run_stage(f"c4_{variant}", r, corpus=V2BIG, evals=(("bigtest", V2BIG),))

    tr1, _ = run_stage("c1_for_enh", sized(c1_stft_dpcl(), 8000, embed_dim=40),
                       corpus=V2BIG, evals=(("bigtest", V2BIG),))
    for variant in ("msa", "psa"):
        r = sized(enh_dpcl(base_run=tr1.dir), 4000)
        r = dc.replace(r, model=dc.replace(r.model, loss_variant=variant))
        run_stage(f"enh_c1_{variant}", r, corpus=V2BIG,
                  evals=(("bigtest", V2BIG), ("v2test", V2)))


def stage_c2_levers():
    """VERDICT item 2 levers on the big corpus: deep pretrain, no-pool
    stride-128, per-filter channel norm (NOTES_r1 item 1 queue)."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import _SEP
    from amss_tpu.utils.config import FrontConfig, ModelConfig, RecipeConfig, TrainConfig

    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer

    store = SpeakerStore(V2BIG)

    def run_c2(name, fr, pre_steps, steps=10000, feature_norm="global"):
        sep = dc.replace(_SEP, embed_dim=40, feature_norm=feature_norm)
        pre = RecipeConfig(
            name=f"{name}_pre",
            model=ModelConfig(kind="adapt_ae", front=fr, sep=sep),
            train=TrainConfig(steps=pre_steps, batch_size=16,
                              valid_every=max(pre_steps // 4, 1)),
        )
        trp = Trainer(pre, store, workdir="runs_r2b")
        trp.fit()
        rec = RecipeConfig(
            name=name,
            model=ModelConfig(kind="dpcl", front=fr, sep=sep, nb_speakers=2,
                              recon_weight=0.2),
            train=TrainConfig(steps=steps, batch_size=16, lr=3e-4,
                              valid_every=steps // 5),
            pretrained_front=trp.dir,
            freeze_front_steps=1500,
        )
        tr, state, secs = train(rec, V2BIG)
        for tag, ecorp in (("bigtest", V2BIG), ("v2test", V2)):
            out = blind_eval(tr.model, state["params"], ecorp)
            out.update(stage=f"{name}_{tag}", steps=steps, train_seconds=secs,
                       run_dir=tr.dir)
            log_result(out)

    pooled = FrontConfig(kind="adapt", n_filters=256, filter_len=256,
                         stride=64, pool=2)
    nopool = FrontConfig(kind="adapt", n_filters=256, filter_len=256,
                         stride=128, pool=1)
    levers = {
        "deeppre": lambda: run_c2("c2_deeppre25k", pooled, pre_steps=25000),
        "nopool": lambda: run_c2("c2_nopool_s128", nopool, pre_steps=10000),
        "chnorm": lambda: run_c2("c2_chnorm", pooled, pre_steps=10000,
                                 feature_norm="channel"),
    }
    # optional sub-selection: `c2_levers nopool chnorm`
    chosen = [a for a in sys.argv[1:] if a in levers] or list(levers)
    for name in chosen:
        levers[name]()


def stage_enh_best():
    """Residual enhancement stacked on the best TasNet run:
    `enh_best <base_run_dir> [train_corpus]`."""
    from amss_tpu.configs.recipes import enh_dpcl

    i = sys.argv.index("enh_best")
    base = sys.argv[i + 1]
    corpus = sys.argv[i + 2] if len(sys.argv) > i + 2 and sys.argv[i + 2] not in STAGES else V2BIG
    r = sized(enh_dpcl(base_run=base), 6000)
    run_stage("enh_on_tasnet", r, corpus=corpus)


def stage_enh_sisdr():
    """Waveform-objective refinement over the best TasNet run:
    `enh_sisdr <base_run_dir> [train_corpus]`."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import enh_dpcl

    i = sys.argv.index("enh_sisdr")
    base = sys.argv[i + 1]
    corpus = sys.argv[i + 2] if len(sys.argv) > i + 2 and sys.argv[i + 2] not in STAGES else V2BIG
    r = sized(enh_dpcl(base_run=base), 6000)
    r = dc.replace(r, model=dc.replace(r.model, loss_variant="sisdr"))
    run_stage("enh_sisdr_on_tasnet", r, corpus=corpus)


def stage_c7_quality():
    """Train the causal low-latency flagship (c7) on the 500-spk corpus and
    measure BOTH offline quality and true streamed quality + RTF."""
    import jax

    from amss_tpu.configs.recipes import c7_realtime
    from amss_tpu.data.mixer import Mixer
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.realtime import RealtimeSeparator

    v2max = "/tmp/amss_corpus_v2max"
    r = sized(c7_realtime(), 16000, schedule="cosine")
    tr, state, secs = train(r, v2max)
    out = blind_eval(tr.model, state["params"], V2)
    out.update(stage="c7_causal_16k_v2test_offline", steps=16000,
               train_seconds=secs, run_dir=tr.dir)
    log_result(out)
    # streamed path: push 512 ms chunks through RealtimeSeparator
    mixer = Mixer(SpeakerStore(V2), nb_speakers=2, chunk_samples=16384, seed=0)
    mixes, refs, est = [], [], []
    rt = RealtimeSeparator(tr.model, state["params"], chunk_samples=4096)
    for i in range(32):
        hb = mixer.batch("test", i, 1)
        refs.append(hb.sources[0])
        mixes.append(hb.sources[0].sum(0))
        est.append(rt.separate_stream(mixes[-1].astype(np.float32)))
    out = evaluate_separation(np.stack(est), np.stack(refs), np.stack(mixes))
    out.update(stage="c7_causal_16k_v2test_streamed", rtf=rt.rtf,
               chunk_ms=4096 / 8.0, run_dir=tr.dir)
    log_result(out)


def stage_eval_run():
    """Evaluate an existing run dir (recover evals lost to tunnel hiccups):
    `eval_run <run_dir> <stage_name>` — evals bigtest + v2test."""
    import json as _json

    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer
    from amss_tpu.utils.config import recipe_from_dict

    i = sys.argv.index("eval_run")
    rd, name = sys.argv[i + 1], sys.argv[i + 2]
    rec = recipe_from_dict(_json.load(open(os.path.join(rd, "config.json"))))
    tr = Trainer(rec, SpeakerStore(V2BIG), run_dir=rd)
    state = tr.restore(best=True)
    for tag, ecorp in (("bigtest", V2BIG), ("v2test", V2)):
        out = blind_eval(tr.model, state["params"], ecorp)
        out.update(stage=f"{name}_{tag}", steps=rec.train.steps, run_dir=rd)
        log_result(out)


STAGES = {
    "tasnet_base": stage_tasnet_base,
    "tasnet_reg": stage_tasnet_reg,
    "tasnet_big": stage_tasnet_big,
    "tasnet_tcn": stage_tasnet_tcn,
    "tasnet_tcn_big": stage_tasnet_tcn_big,
    "tasnet_tcn_huge": stage_tasnet_tcn_huge,
    "tasnet_tcn_max": stage_tasnet_tcn_max,
    "psa_ab": stage_psa_ab,
    "c2_levers": stage_c2_levers,
    "enh_best": stage_enh_best,
    "enh_sisdr": stage_enh_sisdr,
    "eval_run": stage_eval_run,
    "c7_quality": stage_c7_quality,
    "c1_ctrl": stage_c1_ctrl,
}


if __name__ == "__main__":
    ensure_corpora()
    matched = 0
    for arg in sys.argv[1:]:
        if arg in STAGES:  # non-stage args are consumed by stages (enh_best)
            STAGES[arg]()
            matched += 1
    if sys.argv[1:] and not matched:
        raise SystemExit(f"no stage matched in {sys.argv[1:]!r} "
                         f"(known: {sorted(STAGES)})")
    print("R2B WAVE DONE", flush=True)
