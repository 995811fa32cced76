"""Round-3 experiment driver (VERDICT.md r2 items 3, 4, 5, 6).

Stages:
  c6_3spk   — 3-speaker TCN flagship (item 4): c6 at nb_speakers=3 on the
              500-spk corpus, evaluated with bootstrap CIs against the 3-mix
              STFT-IBM oracle ceiling and against c4's +2.88.
  c4_tcn    — Chimera 3-mix with the round-2 levers (item 6): TCN trunk +
              magnitude bin weights on v2big.
  boot      — n>=200 bootstrap-CI re-evaluation of an existing run dir
              (item 3): `boot <run_dir> <name> [corpus] [n]`.
  oracle    — 3-mix / 2-mix STFT-IBM oracle ceiling for a corpus:
              `oracle <corpus> <nb_speakers> <name>`.
  bf16_ab   — bf16 vs f32 on the matmul-dominated TCN (item 5): train-step
              wall time and serving RTF, A/B at identical shapes.

Results append to quality_results.jsonl (committed — survives restarts).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("AMSS_WAVE_CPU"):
    # sitecustomize force-sets jax_platforms="axon,cpu" via jax.config at
    # interpreter start, overriding JAX_PLATFORMS; CPU-safe stages must
    # override the config itself or they dial the tunnel.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

try:  # amortize multi-minute tunnel compiles across wave stages/processes
    from amss_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "quality_results.jsonl")

V2 = "/tmp/amss_corpus_v2"
V2BIG = "/tmp/amss_corpus_v2big"
V2MAX = "/tmp/amss_corpus_v2max"


def log_result(rec):
    rec["time"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def ensure_corpora():
    from amss_tpu.data.synthetic import make_synthetic_corpus

    jobs = [
        (V2, dict(n_speakers=30, seconds_per_speaker=40.0, version=2, seed=0)),
        (V2BIG, dict(n_speakers=100, seconds_per_speaker=120.0, version=2, seed=1)),
        (V2MAX, dict(n_speakers=500, seconds_per_speaker=40.0, version=2, seed=3)),
    ]
    for root, kw in jobs:
        if not os.path.exists(os.path.join(root, "manifest.json")):
            print("generating", root, kw, flush=True)
            make_synthetic_corpus(root, **kw)


def test_mixtures(corpus: str, nb_speakers: int, n: int, chunk: int = 16384):
    """The deterministic test-mixture convention shared by every quality row
    (Mixer seed 0, test split, steps 0..n-1, batch 1)."""
    from amss_tpu.data.mixer import Mixer
    from amss_tpu.data.store import SpeakerStore

    mixer = Mixer(SpeakerStore(corpus), nb_speakers=nb_speakers,
                  chunk_samples=chunk, seed=0)
    mixes, refs = [], []
    for i in range(n):
        hb = mixer.batch("test", i, 1)
        refs.append(hb.sources[0])
        mixes.append(hb.sources[0].sum(0))
    return mixes, refs


def blind_eval(model, params, corpus: str, n: int = 64, chunk: int = 16384):
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator

    mixes, refs = test_mixtures(corpus, model.cfg.nb_speakers, n, chunk)
    sep = StreamingSeparator(model, params)
    est = sep.separate_all(mixes)
    out = evaluate_separation(
        np.stack(est), np.stack(refs), np.stack(mixes), per_utt=True
    )
    out["rtf"] = sep.meter.rtf
    return out


def oracle_eval(corpus: str, nb_speakers: int, n: int = 64, chunk: int = 16384,
                win: int = 256, hop: int = 64):
    """STFT ideal-binary-mask oracle ceiling: the best any TF-mask clustering
    model (dpcl/chimera) can do on these mixtures.  Calibrates whether a weak
    3-mix result is the model or the corpus (VERDICT r2 item 6)."""
    import jax.numpy as jnp

    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.ops.stft import istft_ri, stft_ri

    mixes, refs = test_mixtures(corpus, nb_speakers, n, chunk)
    ests = []
    for mix, src in zip(mixes, refs):
        re_s, im_s = stft_ri(jnp.asarray(src), win, hop)  # [S, T', F]
        mag = jnp.sqrt(re_s**2 + im_s**2)
        ibm = (mag >= jnp.max(mag, axis=0, keepdims=True)).astype(jnp.float32)
        re_m, im_m = stft_ri(jnp.asarray(mix), win, hop)
        est = istft_ri(ibm * re_m[None], ibm * im_m[None], win, hop,
                       length=src.shape[-1])
        ests.append(np.asarray(est))
    return evaluate_separation(
        np.stack(ests), np.stack(refs), np.stack(mixes), per_utt=True
    )


def train(recipe, corpus: str, workdir: str = "runs_r3"):
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer

    # AMSS_SPC: steps_per_call override for chained chip stages.  Run-id
    # excluded (execution-shape knob, bit-exact vs 1), so the trajectory and
    # run dir are unchanged; it only amortizes the tunnel's per-call latency.
    # Advisor r3: (a) never clobber a stage that sets steps_per_call itself
    # (stepscan_ab's K arms), (b) since the run id doesn't cover the knob, an
    # overridden run gets its own workdir so it can't overwrite a K=1 run.
    spc = int(os.environ.get("AMSS_SPC", "0"))
    if spc > 1 and recipe.train.steps_per_call == 1:
        recipe = dataclasses.replace(
            recipe, train=dataclasses.replace(recipe.train,
                                              steps_per_call=spc))
        workdir = os.path.join(workdir, f"spc{spc}")
    tr = Trainer(recipe, SpeakerStore(corpus), workdir=workdir)
    t0 = time.time()
    state = tr.fit()
    return tr, state, round(time.time() - t0, 1)


def run_stage(name, recipe, corpus, evals, n=64):
    tr, state, secs = train(recipe, corpus)
    for tag, ecorp in evals:
        out = blind_eval(tr.model, state["params"], ecorp, n=n)
        out.update(stage=f"{name}_{tag}", steps=recipe.train.steps,
                   train_seconds=secs, run_dir=tr.dir)
        log_result(out)
    return tr, state


def sized(recipe, steps, batch=16, **sep_over):
    t = dataclasses.replace(recipe.train, steps=steps, batch_size=batch,
                            valid_every=max(steps // 10, 1))
    sep = dataclasses.replace(recipe.model.sep, **sep_over) if sep_over \
        else recipe.model.sep
    return dataclasses.replace(
        recipe, train=t, model=dataclasses.replace(recipe.model, sep=sep)
    )


# ---------------------------------------------------------------- stages ---


def stage_c6_3spk():
    """3-speaker TCN flagship on the 500-spk corpus (VERDICT r2 item 4)."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c6_tasnet

    r = sized(c6_tasnet(), 16000)
    r = dc.replace(r, model=dc.replace(r.model, nb_speakers=3))
    run_stage("c6_3spk_tcn_16k", r, V2MAX,
              evals=(("maxtest3", V2MAX), ("v2test3", V2)))
    for tag, corp in (("maxtest3", V2MAX), ("v2test3", V2)):
        out = oracle_eval(corp, 3)
        out.update(stage=f"oracle3_stft_ibm_{tag}")
        log_result(out)


def stage_c4_tcn():
    """Chimera 3-mix with round-2 levers: TCN trunk + magnitude bin weights
    (VERDICT r2 item 6).  Same corpus/budget class as the +2.88 c4 row."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c4_chimera_3mix

    r = sized(c4_chimera_3mix(), 8000, trunk="tcn", blocks=8, repeats=3,
              hidden=128)
    r = dc.replace(r, model=dc.replace(r.model, weight_kind="magnitude"))
    run_stage("c4_tcn_mag_8k", r, V2BIG, evals=(("bigtest", V2BIG),))
    out = oracle_eval(V2BIG, 3)
    out.update(stage="oracle3_stft_ibm_bigtest")
    log_result(out)


def stage_huge250():
    """Retrain the 250-spk flagship into runs_r3 (the round-2b run dir was
    overwritten by the identical-config 500-spk run — the hash doesn't cover
    the corpus) so the 250-vs-500 speaker-diversity claim can carry CIs."""
    from amss_tpu.data.synthetic import make_synthetic_corpus

    v2huge = "/tmp/amss_corpus_v2huge"
    if not os.path.exists(os.path.join(v2huge, "manifest.json")):
        make_synthetic_corpus(v2huge, n_speakers=250, seconds_per_speaker=60.0,
                              version=2, seed=2)
    from amss_tpu.configs.recipes import c6_tasnet

    run_stage("r3_tcn_huge250_16k", sized(c6_tasnet(), 16000), v2huge,
              evals=(("v2test", V2),), n=200)


def stage_boot():
    """`boot <run_dir> <name> [corpus] [n]` — n>=200 bootstrap-CI eval of an
    existing trained run (VERDICT r2 item 3)."""
    from amss_tpu.train.engine import load_model_from_run

    i = sys.argv.index("boot")
    rd, name = sys.argv[i + 1], sys.argv[i + 2]
    corpus = sys.argv[i + 3] if len(sys.argv) > i + 3 else V2
    n = int(sys.argv[i + 4]) if len(sys.argv) > i + 4 else 200
    model, params = load_model_from_run(rd)
    out = blind_eval(model, params, corpus, n=n)
    out.update(stage=name, run_dir=rd)
    log_result(out)


def stage_oracle():
    """`oracle <corpus> <nb_speakers> <name> [n]`."""
    i = sys.argv.index("oracle")
    corpus, s, name = sys.argv[i + 1], int(sys.argv[i + 2]), sys.argv[i + 3]
    n = int(sys.argv[i + 4]) if len(sys.argv) > i + 4 else 200
    out = oracle_eval(corpus, s, n=n)
    out.update(stage=name)
    log_result(out)


def stage_bf16_ab():
    """bf16 vs f32 on the TCN (VERDICT r2 item 5): the round-2 negative was
    measured on the scan-bound BLSTM; the TCN is 1x1-conv/matmul-dominated —
    the case bf16 exists for.  Measures train wall (200 steps, post-compile)
    and serving RTF at identical shapes."""
    import dataclasses as dc

    import jax

    from amss_tpu.configs.recipes import c6_tasnet
    from amss_tpu.infer.streaming import BucketSpec, StreamingSeparator
    from amss_tpu.train.engine import make_model

    t = 65536  # 8 s @ 8 kHz
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(t).astype(np.float32) * 0.3 for _ in range(32)]
    for dtype in ("float32", "bfloat16"):
        r = sized(c6_tasnet(), 220, compute_dtype=dtype)
        tr, state, secs = train(r, V2BIG)
        # steps/sec from the tail of metrics.jsonl (excludes compile)
        rows = [json.loads(l) for l in open(os.path.join(tr.dir, "metrics.jsonl"))]
        walls = [r_["train/steps_per_sec"] for r_ in rows
                 if "train/steps_per_sec" in r_]
        model = make_model(r.model)
        sep = StreamingSeparator(model, state["params"],
                                 buckets=BucketSpec(lengths=(t,)))
        est = sep.separate_all(waves, max_batch=8)
        assert est[0].shape == (2, t)
        log_result({
            "stage": f"bf16_ab_tcn_{dtype}",
            "train_seconds_total": secs,
            "serving_rtf": round(sep.meter.rtf, 6),
            "serving_compute_s": round(sep.meter.compute_seconds, 4),
            "train_steps_per_sec_tail": walls[-3:] if walls else None,
        })


def stage_flagship2():
    """Flagship v2: canonical Conv-TasNet capacity (B=128, H=512 via
    expansion=4) on the 1000-speaker x 60 s corpus — the n=200 bootstrap
    re-evaluation showed the n=32 test draw read ~1 dB optimistic, so the
    10 dB SDRi bar needs a genuinely better model, and the measured levers
    are data diversity then capacity (PARITY.md round-2 ladder)."""
    from amss_tpu.configs.recipes import c6_tasnet

    giant = "/tmp/amss_corpus_v2giant"
    steps = int(sys.argv[sys.argv.index("flagship2") + 1]) \
        if len(sys.argv) > sys.argv.index("flagship2") + 1 else 32000
    r = sized(c6_tasnet(), steps, expansion=4)
    run_stage(f"flagship2_exp4_giant_{steps // 1000}k", r, giant,
              evals=(("v2test", V2), ("gianttest", giant)), n=200)


def stage_flagship2b():
    """Capacity lever isolated: expansion-4 on the PROVEN 500-spk corpus
    (flagship2's exp4+v2giant read 9.49 v2test — worse than exp2+v2max's
    9.96, confounding corpus and capacity; this arm pins the arch effect).
    Longer schedule: 16k->32k gave +0.5 dB at exp2, and exp4 trains at the
    same ~12 steps/s (input-bound), so steps are cheap."""
    from amss_tpu.configs.recipes import c6_tasnet

    steps = int(sys.argv[sys.argv.index("flagship2b") + 1]) \
        if len(sys.argv) > sys.argv.index("flagship2b") + 1 else 48000
    r = sized(c6_tasnet(), steps, expansion=4)
    run_stage(f"flagship2b_exp4_max_{steps // 1000}k", r, V2MAX,
              evals=(("v2test", V2),), n=200)


def stage_input_ab():
    """Input-pipeline A/B on the TCN flagship arch: host mixing + int16 wire
    vs HBM-resident corpus (train.device_data) — flagship2 trained at the
    same ~12 steps/s as the 2x-smaller exp2 arch, suggesting the step is
    input-bound, which device_data exists to fix."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c6_tasnet

    corpus = sys.argv[2] if len(sys.argv) > 2 else V2MAX
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    for dev in (False, True):
        r = sized(c6_tasnet(), steps, expansion=4)
        # valid/ckpt pauses dominate short runs (valid_every=steps//10 read
        # 0.67 steps/s where the long c7v2b run read 12) — disable them so
        # the A/B isolates the input path.
        r = dc.replace(r, train=dc.replace(r.train, device_data=dev,
                                           valid_every=10**9))
        tr, state, secs = train(r, corpus)
        rows = [json.loads(l) for l in open(os.path.join(tr.dir, "metrics.jsonl"))]
        walls = [x["train/steps_per_sec"] for x in rows if "train/steps_per_sec" in x]
        log_result({
            "stage": f"input_ab_device_data_{dev}",
            "corpus": corpus,
            "train_seconds_total": secs,
            "train_steps_per_sec_tail": walls[-3:],
        })


def stage_stepscan_ab():
    """steps_per_call A/B on the chip (train.steps_per_call, the round-3
    dispatch-latency lever): input_ab measured ~12.4 steps/s for BOTH input
    paths — an ~80 ms/step floor set by the ~38 ms per-call tunnel round
    trip, not by input bandwidth or compute.  Scanning K steps inside one
    jitted call amortizes that floor K ways; this stage measures the actual
    curve at K in (1, 4, 16) on the exp4 flagship arch with the
    HBM-resident corpus.  `stepscan_ab [corpus] [steps]`."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c6_tasnet

    i = sys.argv.index("stepscan_ab")
    corpus = sys.argv[i + 1] if len(sys.argv) > i + 1 else V2MAX
    steps = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 400
    for k in (1, 4, 16):
        r = sized(c6_tasnet(), steps, expansion=4)
        r = dc.replace(r, train=dc.replace(r.train, device_data=True,
                                           steps_per_call=k,
                                           valid_every=10**9))
        # steps_per_call is excluded from the run id (same trajectory), so
        # the three arms would collide on one dir — separate workdirs.
        tr, state, secs = train(r, corpus, workdir=f"runs_r3/spc{k}")
        rows = [json.loads(l)
                for l in open(os.path.join(tr.dir, "metrics.jsonl"))]
        walls = [x["train/steps_per_sec"] for x in rows
                 if "train/steps_per_sec" in x]
        log_result({
            "stage": f"stepscan_ab_k{k}",
            "corpus": corpus,
            "train_seconds_total": secs,
            "train_steps_per_sec_tail": walls[-3:],
        })


def stage_c7v2():
    """Causal flagship v2: same capacity/data lift as flagship2 (expansion=4,
    1000-spk corpus) applied to the low-latency causal recipe."""
    from amss_tpu.configs.recipes import c7_realtime

    giant = "/tmp/amss_corpus_v2giant"
    steps = int(sys.argv[sys.argv.index("c7v2") + 1]) \
        if len(sys.argv) > sys.argv.index("c7v2") + 1 else 32000
    r = sized(c7_realtime(), steps, expansion=4, repeats=3)
    run_stage(f"c7v2_exp4_giant_{steps // 1000}k", r, giant,
              evals=(("v2test", V2),), n=200)


def stage_3spk2():
    """3-speaker flagship v2: expansion=4 + the 1000-spk corpus, 3-mix."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c6_tasnet

    giant = "/tmp/amss_corpus_v2giant"
    steps = int(sys.argv[sys.argv.index("3spk2") + 1]) \
        if len(sys.argv) > sys.argv.index("3spk2") + 1 else 24000
    r = sized(c6_tasnet(), steps, expansion=4)
    r = dc.replace(r, model=dc.replace(r.model, nb_speakers=3))
    run_stage(f"c6_3spk2_exp4_giant_{steps // 1000}k", r, giant,
              evals=(("v2test3", V2),), n=64)


def stage_c7v2b():
    """Causal flagship v3 arm: flagship2b's lesson applied to the causal
    recipe — expansion-4 on the PROVEN 500-spk corpus (c7v2's exp4+v2giant
    read 8.54; the 2-mix de-confound showed v2max > v2giant by ~0.5 dB at
    equal arch/steps) plus the longer 48k schedule."""
    from amss_tpu.configs.recipes import c7_realtime

    steps = int(sys.argv[sys.argv.index("c7v2b") + 1]) \
        if len(sys.argv) > sys.argv.index("c7v2b") + 1 else 48000
    r = sized(c7_realtime(), steps, expansion=4, repeats=3)
    run_stage(f"c7v2b_exp4_max_{steps // 1000}k", r, V2MAX,
              evals=(("v2test", V2),), n=200)


def stage_3spk3():
    """3-speaker flagship v3 arm: same de-confound for the 3-mix setting —
    exp4 on v2max (3spk2's winner used v2giant, confounded with steps) at a
    40k schedule."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c6_tasnet

    steps = int(sys.argv[sys.argv.index("3spk3") + 1]) \
        if len(sys.argv) > sys.argv.index("3spk3") + 1 else 40000
    r = sized(c6_tasnet(), steps, expansion=4)
    r = dc.replace(r, model=dc.replace(r.model, nb_speakers=3))
    run_stage(f"c6_3spk3_exp4_max_{steps // 1000}k", r, V2MAX,
              evals=(("v2test3", V2),), n=64)


def stage_resume():
    """`resume <run_dir> <corpus> <stage_name> [eval_corpus] [n]` — restore
    ckpt_latest from a run dir whose training was killed mid-flight (tunnel
    outage) and continue fit() to the configured steps; the stateless
    (seed, step) Mixer makes the continuation bit-exact with an uninterrupted
    run.  Then the usual blind eval."""
    import json as _json

    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer
    from amss_tpu.utils.config import recipe_from_dict

    run_dir, corpus, name = sys.argv[2], sys.argv[3], sys.argv[4]
    ecorp = sys.argv[5] if len(sys.argv) > 5 else V2
    n = int(sys.argv[6]) if len(sys.argv) > 6 else 64
    with open(os.path.join(run_dir, "config.json")) as f:
        recipe = recipe_from_dict(_json.load(f))
    tr = Trainer(recipe, SpeakerStore(corpus),
                 workdir=os.path.dirname(run_dir) or "runs_r3")
    assert tr.dir == run_dir, f"config hash moved: {tr.dir} != {run_dir}"
    state = tr.restore()
    start_step = state["step"]
    print(f"resuming {run_dir} from step {start_step}", flush=True)
    t0 = time.time()
    state = tr.fit(state)
    out = blind_eval(tr.model, state["params"], ecorp, n=n)
    out.update(stage=f"{name}_v2test3" if recipe.model.nb_speakers == 3
               else f"{name}_v2test",
               steps=recipe.train.steps,
               train_seconds=round(time.time() - t0, 1), run_dir=tr.dir,
               resumed_from=start_step)
    log_result(out)


def stage_dpt_probe():
    """First chip training of the dual-path-transformer trunk (sep.trunk=
    'dpt', models/dptransformer.py): c6 waveform-PIT arch with the TCN trunk
    swapped for intra/inter-chunk attention, 8k steps on the 500-spk corpus
    — a calibration probe (the TCN flagship reads ~9.4 at 16k steps, ~8 at
    8k-step scale), not a tuned flagship.  `dpt_probe [steps]`."""
    from amss_tpu.configs.recipes import c6_tasnet

    steps = int(sys.argv[sys.argv.index("dpt_probe") + 1]) \
        if len(sys.argv) > sys.argv.index("dpt_probe") + 1 else 8000
    r = sized(c6_tasnet(), steps, trunk="dpt", hidden=192, blocks=6,
              chunk_frames=32, heads=4, expansion=4, dropout=0.1)
    run_stage(f"dpt_probe_{steps // 1000}k", r, V2MAX,
              evals=(("v2test", V2),), n=64)


def stage_c3_modern():
    """Modernize the enrolled-L41 headline (round-1's +12.4 was n=32 on the
    30-spk corpus): retrain c3 on the 100-spk corpus, evaluate the enrolled
    path on n=200 train-speaker mixtures at unseen offsets WITH bootstrap
    CIs, blind-eval the k-means path, and export the checkpoint.
    `c3_modern [steps]`."""
    import jax
    import jax.numpy as jnp

    from amss_tpu.configs.recipes import c3_l41
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.infer.evaluate import evaluate_separation

    steps = int(sys.argv[sys.argv.index("c3_modern") + 1]) \
        if len(sys.argv) > sys.argv.index("c3_modern") + 1 else 10000
    store = SpeakerStore(V2BIG)
    r = sized(c3_l41(n_train_speakers=len(store.speakers)), steps)
    tr, state, secs = train(r, V2BIG)

    # enrolled eval: train-split speakers at unseen chunk offsets
    n = 200
    mixes, refs, sids = [], [], []
    for i in range(n):
        hb = tr.mixer.batch("train", 10_000_000 + i, 1)
        refs.append(hb.sources[0])
        mixes.append(hb.sources[0].sum(0))
        sids.append(hb.speaker_ids[0])
    fn = jax.jit(lambda p, m, s: tr.model.separate(p, m, speaker_ids=s))
    est = np.asarray(fn(state["params"], jnp.asarray(np.stack(mixes)),
                        jnp.asarray(np.stack(sids))))
    out = evaluate_separation(est, np.stack(refs), np.stack(mixes),
                              per_utt=True)
    out.update(stage=f"c3_modern_{steps // 1000}k_enrolled", steps=steps,
               train_seconds=secs, run_dir=tr.dir)
    log_result(out)

    # blind eval (k-means over embeddings, disjoint test speakers)
    outb = blind_eval(tr.model, state["params"], V2BIG, n=64)
    outb.update(stage=f"c3_modern_{steps // 1000}k_blind", steps=steps,
                run_dir=tr.dir)
    log_result(outb)

    from export_flagship import export

    export(tr.dir, os.path.join(REPO, "checkpoints", "c3_l41"))


def stage_ema_ab():
    """Parameter-EMA A/B on the flagship arch (train.ema_decay, round-3
    engine feature): c6 exp4 on the 500-spk corpus with EMA tracked during
    training — eval BOTH the raw final params and the EMA weights on n=200
    v2test.  The no-EMA control at the same arch/corpus/steps is already
    recorded (flagship500_16k_boot200: 9.43 [9.15, 9.71]).
    `ema_ab [steps] [decay]`."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c6_tasnet

    i = sys.argv.index("ema_ab")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 16000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.997
    r = sized(c6_tasnet(), steps, expansion=4)
    r = dc.replace(r, train=dc.replace(r.train, ema_decay=decay))
    tr, state, secs = train(r, V2MAX)
    for tag, p in (("raw", state["params"]), ("ema", state["ema_params"])):
        out = blind_eval(tr.model, p, V2, n=200)
        out.update(stage=f"ema_ab_{steps // 1000}k_d{decay}_{tag}",
                   steps=steps, train_seconds=secs, run_dir=tr.dir)
        log_result(out)


def stage_noise_ab():
    """Noise-robust training A/B (model.train_noise_snr_db, round-3 engine
    feature): c6 exp4 trained WITH in-graph mixture noise (5-20 dB SNR) vs
    the committed clean-trained flagship, both evaluated on (a) clean v2test
    and (b) v2test corrupted at 5 dB SNR.  Expectation: the noisy-trained
    model gives up a little clean quality and wins big under noise.
    `noise_ab [steps]`."""
    import dataclasses as dc

    import numpy as np

    from amss_tpu.configs.recipes import c6_tasnet
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator
    from amss_tpu.train.engine import load_model_from_run

    i = sys.argv.index("noise_ab")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 16000
    r = sized(c6_tasnet(), steps, expansion=4)
    r = dc.replace(r, model=dc.replace(r.model, train_noise_snr_db=(5.0, 20.0)))
    tr, state, secs = train(r, V2MAX)

    def eval_model(model, params, tag, snr_db=None, n=200):
        mixes, refs = test_mixtures(V2, 2, n)
        if snr_db is not None:
            rng = np.random.default_rng(1234)
            for k in range(len(mixes)):
                m = mixes[k]
                noise = rng.standard_normal(m.shape).astype(np.float32)
                scale = (np.sqrt(np.mean(m**2)) * 10.0 ** (-snr_db / 20.0)
                         / max(np.sqrt(np.mean(noise**2)), 1e-9))
                mixes[k] = m + noise * scale
        sep = StreamingSeparator(model, params)
        est = sep.separate_all(mixes, max_batch=8)
        out = evaluate_separation(np.stack(est), np.stack(refs),
                                  np.stack(mixes), per_utt=True)
        out.pop("si_sdri_per_utt", None)
        out.pop("sdri_per_utt", None)
        out.update(stage=tag, steps=steps, run_dir=tr.dir)
        log_result(out)

    eval_model(tr.model, state["params"],
               f"noise_ab_{steps // 1000}k_noisytrain_clean")
    eval_model(tr.model, state["params"],
               f"noise_ab_{steps // 1000}k_noisytrain_snr5", snr_db=5.0)
    m0, p0 = load_model_from_run(os.path.join(REPO, "checkpoints",
                                              "c6_flagship"))
    eval_model(m0, p0, "noise_ab_cleanflagship_clean")
    eval_model(m0, p0, "noise_ab_cleanflagship_snr5", snr_db=5.0)


def stage_reverb_ab():
    """Reverb-robust training A/B (model.train_reverb_rt60, round-3 feature):
    c6 exp4 trained WITH in-graph per-source synthetic RIRs (RT60 0.1-0.4 s)
    vs the committed dry-trained flagship, both evaluated on (a) dry v2test
    and (b) v2test reverberated at RT60 0.3 s.  Expectation mirrors noise_ab:
    the reverb-trained model wins big on reverberant mixtures.
    `reverb_ab [steps]`."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amss_tpu.configs.recipes import c6_tasnet
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator
    from amss_tpu.models.front import reverberate_sources
    from amss_tpu.train.engine import load_model_from_run

    i = sys.argv.index("reverb_ab")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 16000
    r = sized(c6_tasnet(), steps, expansion=4)
    r = dc.replace(r, model=dc.replace(r.model,
                                       train_reverb_rt60=(800, 3200)))
    tr, state, secs = train(r, V2MAX)

    def eval_model(model, params, tag, rt60_s=None, n=200):
        mixes, refs = test_mixtures(V2, 2, n)
        if rt60_s is not None:
            rt = int(round(rt60_s * 8000))
            for k in range(len(mixes)):
                wet = reverberate_sources(
                    jnp.asarray(refs[k][None]),
                    jax.random.fold_in(jax.random.PRNGKey(1234), k),
                    (rt, rt),
                )
                mixes[k] = np.asarray(wet[0]).sum(0)
        sep = StreamingSeparator(model, params)
        est = sep.separate_all(mixes, max_batch=8)
        out = evaluate_separation(np.stack(est), np.stack(refs),
                                  np.stack(mixes), per_utt=True)
        out.pop("si_sdri_per_utt", None)
        out.pop("sdri_per_utt", None)
        out.update(stage=tag, steps=steps, run_dir=tr.dir)
        log_result(out)

    eval_model(tr.model, state["params"],
               f"reverb_ab_{steps // 1000}k_revtrain_dry")
    eval_model(tr.model, state["params"],
               f"reverb_ab_{steps // 1000}k_revtrain_rt300", rt60_s=0.3)
    m0, p0 = load_model_from_run(os.path.join(REPO, "checkpoints",
                                              "c6_flagship"))
    eval_model(m0, p0, "reverb_ab_dryflagship_dry")
    eval_model(m0, p0, "reverb_ab_dryflagship_rt300", rt60_s=0.3)


def count_accuracy(model, params, corpus, n, ks=(1, 2, 3), k_max=4):
    """Per-true-k blind-count accuracy + confusion, deterministic test draw."""
    import jax.numpy as jnp

    from amss_tpu.infer.count import count_speakers

    confusion, acc = {}, {}
    for true_k in ks:
        mixes, _ = test_mixtures(corpus, true_k, n)
        est = np.asarray(count_speakers(
            model, params, jnp.asarray(np.stack(mixes)), k_max=k_max))
        confusion[true_k] = {int(k): int(c) for k, c in
                             zip(*np.unique(est, return_counts=True))}
        acc[true_k] = float(np.mean(est == true_k))
    return acc, confusion


def stage_count_eval():
    """Blind speaker-count accuracy (infer/count.py) on TRAINED embeddings,
    counting mixtures of 1/2/3 speakers from a corpus's test split.  Emits
    per-true-k accuracy and the confusion matrix.  CPU-safe.
    `count_eval [run_dir] [n_per_k]` (default: the committed c1 checkpoint —
    trained on fixed 2-mixes, so counting there is zero-shot)."""
    from amss_tpu.train.engine import load_model_from_run

    i = sys.argv.index("count_eval")
    run_dir = sys.argv[i + 1] if len(sys.argv) > i + 1 else \
        os.path.join(REPO, "checkpoints", "c1_dpcl")
    n = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 50
    model, params = load_model_from_run(run_dir)
    acc, confusion = count_accuracy(model, params, V2, n)
    log_result({"stage": f"count_eval_n{n}", "accuracy": acc,
                "confusion": confusion,
                "run_dir": os.path.relpath(run_dir, REPO)})


def stage_count_sep_eval():
    """The full blind-count pipeline measured end-to-end: mixtures of UNKNOWN
    speaker count (1/2/3 drawn from the test split) -> eigengap count ->
    separate at the estimated k -> SI-SDRi against the true sources, scored
    only over correctly-counted mixtures plus count accuracy (a wrong count
    makes per-source SI-SDR ill-defined; the count error rate IS the other
    half of the metric).  `count_sep_eval <run_dir> [n_per_k]`.  CPU-safe."""
    from amss_tpu.train.engine import load_model_from_run

    i = sys.argv.index("count_sep_eval")
    run_dir = sys.argv[i + 1]
    n = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 32
    model, params = load_model_from_run(run_dir)
    out = count_sep_eval_model(model, params, n)
    out.update(stage=f"count_sep_eval_n{n}",
               run_dir=os.path.relpath(run_dir, REPO))
    log_result(out)


def count_sep_eval_model(model, params, n: int) -> dict:
    import jax.numpy as jnp

    from amss_tpu.infer.count import count_speakers
    from amss_tpu.infer.evaluate import evaluate_separation

    out = {}
    for true_k in (1, 2, 3):
        mixes, refs = test_mixtures(V2, true_k, n)
        mix = jnp.asarray(np.stack(mixes))
        est_k = np.asarray(count_speakers(model, params, mix, k_max=4))
        ok = est_k == true_k
        row = {"count_acc": float(ok.mean())}
        if ok.any() and true_k > 1:
            sep = np.asarray(model.separate(params, mix[np.flatnonzero(ok)],
                                            n_speakers=true_k))
            r = evaluate_separation(
                sep, np.stack(refs)[np.flatnonzero(ok)],
                np.stack(mixes)[np.flatnonzero(ok)])
            row["si_sdri_when_correct"] = r["si_sdri"]
        out[f"k{true_k}"] = row
    return out


def stage_count_rules():
    """Compare count-decision rules on one model's embedding-Gram spectra:
    relative eigengap (infer/count.py default), absolute gap, eigenvalue >
    tau*lam1, eigenvalue > tau*trace (cluster-weight-share reading).  Guides
    whether the default rule should change — decided on CHIP-trained
    count-diverse embeddings, not hand-tuned thresholds on weak CPU models.
    `count_rules <run_dir> [n_per_k] [weight_kind]` (weight_kind: vad |
    magnitude | magvad).  CPU-safe with AMSS_WAVE_CPU=1."""
    from amss_tpu.train.engine import load_model_from_run

    i = sys.argv.index("count_rules")
    run_dir = sys.argv[i + 1]
    n = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 24
    wk = sys.argv[i + 3] if len(sys.argv) > i + 3 else "vad"
    model, params = load_model_from_run(run_dir)
    out = count_rules_model(model, params, n, weight_kind=wk)
    out.update(stage=f"count_rules_n{n}_{wk}",
               run_dir=os.path.relpath(run_dir, REPO))
    log_result(out)


def count_rules_model(model, params, n: int, weight_kind: str = "vad") -> dict:
    import jax.numpy as jnp

    from amss_tpu.models.front import bin_weights

    c = model.cfg
    spectra = {}
    for true_k in (1, 2, 3):
        mixes, _ = test_mixtures(V2, true_k, n)
        mix = jnp.asarray(np.stack(mixes))
        codes, _ = model.front.encode(params["front"], mix)
        feats = model.front.features(params["front"], codes)
        v = model.embed(params, feats, None)
        w = bin_weights(codes, weight_kind, c.vad_threshold_db)
        b = v.shape[0]
        vf = v.reshape(b, -1, v.shape[-1])
        wf = w.reshape(b, -1)
        g = jnp.einsum("bne,bnf->bef", vf * wf[..., None], vf)
        g = g / jnp.maximum(wf.sum(-1), 1e-8)[:, None, None]
        g = 0.5 * (g + jnp.swapaxes(g, -1, -2))
        lam = np.asarray(jnp.linalg.eigh(g)[0])[:, ::-1]
        spectra[true_k] = np.maximum(lam, 0.0)

    kmax = 4

    def acc(rule):
        return {k: float((rule(lam) == k).mean()) for k, lam in spectra.items()}

    def relgap(lam):
        top = lam[:, : kmax + 1]
        return np.argmax((top[:, :-1] - top[:, 1:]) / (top[:, :-1] + 1e-8),
                         axis=1) + 1

    def absgap(lam):
        top = lam[:, : kmax + 1]
        return np.argmax(top[:, :-1] - top[:, 1:], axis=1) + 1

    rules = {"relgap": acc(relgap), "absgap": acc(absgap)}
    for tau in (0.1, 0.15, 0.2, 0.25, 0.3):
        rules[f"thresh_lam1_{tau}"] = acc(
            lambda lam, t=tau: np.clip(
                (lam[:, :kmax] > t * lam[:, :1]).sum(1), 1, kmax))
    for tau in (0.05, 0.1, 0.15, 0.2):
        rules[f"thresh_trace_{tau}"] = acc(
            lambda lam, t=tau: np.clip(
                (lam[:, :kmax] > t * lam.sum(1, keepdims=True)).sum(1), 1,
                kmax))
    return {"rules": rules,
            "mean_top5": {k: np.round(l[:, :5].mean(0), 4).tolist()
                          for k, l in spectra.items()}}


def stage_count_cpu():
    """CPU-scale count-diverse DPCL (tunnel-outage fallback for count_train):
    c1 arch shrunk to hidden=96/layers=2/embed=16, nb_speakers=3,
    train_min_speakers=1 on the 30-spk V2 corpus, then the counting and
    auto-k pipeline evals.  Run with AMSS_WAVE_CPU=1.  `count_cpu [steps]`."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c1_stft_dpcl

    i = sys.argv.index("count_cpu")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 3000
    r = c1_stft_dpcl()
    r = dc.replace(
        r,
        train=dc.replace(r.train, steps=steps, batch_size=8,
                         chunk_samples=8192,
                         valid_every=max(steps // 5, 1), valid_steps=2),
        model=dc.replace(r.model, nb_speakers=3, train_min_speakers=1,
                         sep=dc.replace(r.model.sep, hidden=96, layers=2,
                                        embed_dim=16)),
    )
    tr, state = run_stage(f"count_cpu_dpcl_{steps}", r, V2,
                          evals=(("v2test3", V2),), n=16)
    acc, confusion = count_accuracy(tr.model, state["params"], V2, 24)
    log_result({"stage": f"count_cpu_dpcl_{steps}_counting",
                "accuracy": acc, "confusion": confusion, "run_dir": tr.dir})
    out = count_sep_eval_model(tr.model, state["params"], 16)
    out.update(stage=f"count_cpu_dpcl_{steps}_sep_eval", run_dir=tr.dir)
    log_result(out)


def stage_count_train():
    """Count-diverse DPCL (train_min_speakers=1, nb_speakers=3, the new
    in-graph source dropout) on the 500-spk corpus, then the same counting
    eval stage_count_eval runs on fixed-count embeddings.  The hypothesis
    from the zero-shot negative (count_eval_n12: everything collapses to
    k=2): embeddings only encode counts the training distribution contained.
    Also logs 2-mix blind separation quality so the counting knob's cost to
    separation is measured, not assumed.  `count_train [steps]`."""
    import dataclasses as dc

    from amss_tpu.configs.recipes import c1_stft_dpcl

    i = sys.argv.index("count_train")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 12000
    r = sized(c1_stft_dpcl(), steps)
    r = dc.replace(r, model=dc.replace(r.model, nb_speakers=3,
                                       train_min_speakers=1))
    tr, state = run_stage(f"count_train_dpcl_{steps}", r, V2MAX,
                          evals=(("maxtest3", V2MAX),))
    acc, confusion = count_accuracy(tr.model, state["params"], V2, 50)
    log_result({"stage": f"count_train_dpcl_{steps}_counting",
                "accuracy": acc, "confusion": confusion, "run_dir": tr.dir})
    out = count_sep_eval_model(tr.model, state["params"], 32)
    out.update(stage=f"count_train_dpcl_{steps}_sep_eval", run_dir=tr.dir)
    log_result(out)
    for wk in ("vad", "magvad"):
        out = count_rules_model(tr.model, state["params"], 32, weight_kind=wk)
        out.update(stage=f"count_train_dpcl_{steps}_rules_{wk}",
                   run_dir=tr.dir)
        log_result(out)


STAGES = {
    "count_cpu": stage_count_cpu,
    "count_rules": stage_count_rules,
    "count_sep_eval": stage_count_sep_eval,
    "count_train": stage_count_train,
    "count_eval": stage_count_eval,
    "reverb_ab": stage_reverb_ab,
    "noise_ab": stage_noise_ab,
    "ema_ab": stage_ema_ab,
    "c3_modern": stage_c3_modern,
    "dpt_probe": stage_dpt_probe,
    "resume": stage_resume,
    "c6_3spk": stage_c6_3spk,
    "c7v2b": stage_c7v2b,
    "3spk3": stage_3spk3,
    "flagship2": stage_flagship2,
    "c7v2": stage_c7v2,
    "3spk2": stage_3spk2,
    "flagship2b": stage_flagship2b,
    "input_ab": stage_input_ab,
    "stepscan_ab": stage_stepscan_ab,
    "huge250": stage_huge250,
    "c4_tcn": stage_c4_tcn,
    "boot": stage_boot,
    "oracle": stage_oracle,
    "bf16_ab": stage_bf16_ab,
}


if __name__ == "__main__":
    ensure_corpora()
    matched = 0
    for arg in sys.argv[1:]:
        if arg in STAGES:
            STAGES[arg]()
            matched += 1
    if sys.argv[1:] and not matched:
        raise SystemExit(f"no stage matched in {sys.argv[1:]!r} "
                         f"(known: {sorted(STAGES)})")
    print("R3 WAVE DONE", flush=True)
