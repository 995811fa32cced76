"""Command-line surface: train / evaluate / separate / ingest / make-synthetic.

Capability parity: the reference's per-recipe experiment scripts with argparse
hyperparameters (SURVEY.md §2.5, §5.6).  One binary, subcommands per recipe
stage; every hyperparameter that defined a reference run-id is overridable.

  python -m amss_tpu.cli make-synthetic --out /tmp/corpus
  python -m amss_tpu.cli train --recipe c1 --corpus /tmp/corpus
  python -m amss_tpu.cli train --recipe c2_pretrain --corpus /tmp/corpus
  python -m amss_tpu.cli train --recipe c2 --corpus /tmp/corpus \
      --pretrained-front runs/c2_pretrain_<id>
  python -m amss_tpu.cli evaluate --recipe c1 --corpus /tmp/corpus --run-dir ...
  python -m amss_tpu.cli separate --recipe c1 --run-dir ... --wav a.wav b.wav
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _add_train_overrides(p: argparse.ArgumentParser):
    p.add_argument("--steps", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--chunk-samples", type=int)
    p.add_argument("--lr", type=float)
    p.add_argument("--lr-schedule", choices=["const", "cosine"])
    p.add_argument("--warmup-steps", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--valid-every", type=int)
    p.add_argument("--data-axis", type=int, help="devices on the data mesh axis")
    p.add_argument("--device-data", action="store_const", const=True, default=None,
                   help="HBM-resident corpus: per-step batches are tiny "
                        "(speaker, start, gain) plans gathered on device")
    p.add_argument("--accum-steps", type=int,
                   help="gradient accumulation microbatches per step")
    p.add_argument("--steps-per-call", type=int,
                   help="optimizer steps scanned inside one jitted call "
                        "(amortizes per-call dispatch latency; identical "
                        "per-step math, excluded from the run id)")
    p.add_argument("--ema-decay", type=float,
                   help="parameter EMA decay (0 = off); EMA weights are "
                        "validated, ranked for ckpt_best, and served")
    p.add_argument("--valid-quality", action="store_const", const=True,
                   default=None,
                   help="also log valid/si_sdri (full inference path on one "
                        "valid batch) at every validation")
    p.add_argument("--early-stop-patience", type=int,
                   help="stop after N consecutive validations without a new "
                        "best valid loss (0 = off; ckpt_best keeps the best)")
    p.add_argument("--hidden", type=int)
    p.add_argument("--layers", type=int)
    p.add_argument("--embed-dim", type=int)
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"])
    p.add_argument("--trunk", choices=["blstm", "dprnn", "tcn", "dpt"])
    p.add_argument("--heads", type=int, help="dpt attention heads")
    p.add_argument("--blocks", type=int,
                   help="dprnn/dpt dual-path block count / tcn blocks per repeat")
    p.add_argument("--repeats", type=int, help="tcn dilation-ladder repeats")
    p.add_argument("--kernel", type=int, help="tcn depthwise kernel width")
    p.add_argument("--expansion", type=int,
                   help="tcn conv channels / dpt ffn dim = expansion * hidden")
    p.add_argument("--chunk-frames", type=int,
                   help="dprnn/dpt intra-chunk length K")
    p.add_argument("--dropout", type=float)
    p.add_argument("--feature-norm", choices=["global", "channel", "cumulative"])
    p.add_argument("--causal", action=argparse.BooleanOptionalAction, default=None,
                   help="causal TCN trunk (low-latency streaming, recipe c7); "
                        "--no-causal overrides a recipe's causal default")
    p.add_argument("--loss-variant", choices=["msa", "psa", "sisdr"],
                   help="mask-inference target (psa = phase-sensitive)")
    p.add_argument("--weight-kind", choices=["vad", "magnitude", "magvad"])
    p.add_argument("--vad-threshold-db", type=float)
    p.add_argument("--train-noise-snr", type=float, nargs=2,
                   metavar=("LO", "HI"),
                   help="noise-robust training: corrupt the observed mixture "
                        "in-graph with white noise at a per-utterance SNR "
                        "drawn uniformly from [LO, HI] dB (targets stay "
                        "clean); omit for the reference's clean setting")
    p.add_argument("--train-reverb-rt60", type=float, nargs=2,
                   metavar=("LO", "HI"),
                   help="reverb-robust training: convolve each source with "
                        "its own synthetic RIR, RT60 drawn uniformly from "
                        "[LO, HI] SECONDS (converted to samples at the "
                        "recipe's rate); targets stay dry — trains joint "
                        "dereverberation + separation")
    p.add_argument("--train-reverb-drr", type=float, nargs=2,
                   metavar=("LO", "HI"),
                   help="direct-to-reverb ratio draw in dB for synthetic "
                        "RIRs (default 0 10; needs --train-reverb-rt60)")
    p.add_argument("--min-speakers", type=int,
                   help="count-diverse training (clustering recipes only): "
                        "each sample draws an active speaker count uniformly "
                        "from {MIN..nb_speakers}, the rest zeroed in-graph — "
                        "enables blind speaker counting "
                        "(separate --num-speakers auto)")


def _build_recipe(args, store):
    from amss_tpu.configs.recipes import ALL_RECIPES

    factory = ALL_RECIPES[args.recipe]
    kwargs = {}
    if args.recipe == "c3":
        kwargs["n_train_speakers"] = len(store.speakers)
    if args.recipe == "c2" and getattr(args, "pretrained_front", None):
        kwargs["pretrained_front"] = args.pretrained_front
    if args.recipe == "enh":
        kwargs["base_run"] = args.base_run
    recipe = factory(**kwargs)

    tover = {
        k: v
        for k, v in {
            "steps": args.steps,
            "batch_size": args.batch_size,
            "chunk_samples": args.chunk_samples,
            "lr": args.lr,
            "lr_schedule": getattr(args, "lr_schedule", None),
            "warmup_steps": getattr(args, "warmup_steps", None),
            "seed": args.seed,
            "valid_every": args.valid_every,
            "data_axis": args.data_axis,
            "device_data": getattr(args, "device_data", None),
            "accum_steps": getattr(args, "accum_steps", None),
            "steps_per_call": getattr(args, "steps_per_call", None),
            "ema_decay": getattr(args, "ema_decay", None),
            "valid_quality": getattr(args, "valid_quality", None),
            "early_stop_patience": getattr(args, "early_stop_patience", None),
        }.items()
        if v is not None
    }
    # getattr: callers (tests, scripts) may pass partial Namespaces
    sover = {
        k: v
        for k, v in {
            "hidden": getattr(args, "hidden", None),
            "layers": getattr(args, "layers", None),
            "embed_dim": getattr(args, "embed_dim", None),
            "compute_dtype": getattr(args, "compute_dtype", None),
            "trunk": getattr(args, "trunk", None),
            "blocks": getattr(args, "blocks", None),
            "repeats": getattr(args, "repeats", None),
            "kernel": getattr(args, "kernel", None),
            "expansion": getattr(args, "expansion", None),
            "chunk_frames": getattr(args, "chunk_frames", None),
            "heads": getattr(args, "heads", None),
            "dropout": getattr(args, "dropout", None),
            "feature_norm": getattr(args, "feature_norm", None),
            "causal": getattr(args, "causal", None),
        }.items()
        if v is not None
    }
    mover = {
        k: v
        for k, v in {
            "loss_variant": getattr(args, "loss_variant", None),
            "weight_kind": getattr(args, "weight_kind", None),
            "vad_threshold_db": getattr(args, "vad_threshold_db", None),
            "train_noise_snr_db": (
                tuple(args.train_noise_snr)
                if getattr(args, "train_noise_snr", None) is not None else None
            ),
            "train_reverb_rt60": (
                tuple(int(round(s * recipe.sample_rate))
                      for s in args.train_reverb_rt60)
                if getattr(args, "train_reverb_rt60", None) is not None
                else None
            ),
            "train_reverb_drr_db": (
                tuple(args.train_reverb_drr)
                if getattr(args, "train_reverb_drr", None) is not None else None
            ),
            "train_min_speakers": getattr(args, "min_speakers", None),
        }.items()
        if v is not None
    }
    if "train_reverb_drr_db" in mover and "train_reverb_rt60" not in mover:
        raise SystemExit("--train-reverb-drr needs --train-reverb-rt60")
    if tover:
        recipe = dataclasses.replace(recipe, train=dataclasses.replace(recipe.train, **tover))
    if sover or mover:
        recipe = dataclasses.replace(
            recipe,
            model=dataclasses.replace(
                recipe.model,
                sep=dataclasses.replace(recipe.model.sep, **sover),
                **mover,
            ),
        )
    if recipe.model.loss_variant == "sisdr" and recipe.model.kind != "enhance":
        # only EnhancerModel implements the sisdr objective; on mask models
        # the value would silently fall through to the msa branch and the
        # user would believe the wrong objective trained (advisor r2)
        raise SystemExit(
            "--loss-variant sisdr is the enhancement-stage waveform objective "
            f"(recipe enh); model kind {recipe.model.kind!r} trains msa/psa only"
        )
    ms = recipe.model.train_min_speakers
    if ms is not None:
        # PIT waveform losses are degenerate on zero targets (SI-SDR of an
        # all-zero reference) and L41 ties each source slot to a speaker id —
        # count-diverse dropout is a clustering-objective feature.
        if recipe.model.kind not in ("dpcl", "chimera"):
            raise SystemExit(
                "--min-speakers trains a variable-count clustering embedding; "
                f"model kind {recipe.model.kind!r} is not a clustering "
                "objective (use recipes c1/c4)"
            )
        if not 1 <= ms <= recipe.model.nb_speakers:
            raise SystemExit(
                f"--min-speakers {ms} must be in [1, nb_speakers="
                f"{recipe.model.nb_speakers}]"
            )
    return recipe


def cmd_make_synthetic(args):
    from amss_tpu.data.synthetic import make_synthetic_corpus

    make_synthetic_corpus(
        args.out, n_speakers=args.speakers, seconds_per_speaker=args.seconds
    )
    print(f"synthetic corpus: {args.speakers} speakers at {args.out}")


def cmd_ingest(args):
    from amss_tpu.data.store import ingest_wav_tree

    store = ingest_wav_tree(args.wav_root, args.out, sample_rate=args.sample_rate)
    print(
        f"ingested {len(store.speakers)} speakers into {args.out} "
        f"at {store.sample_rate} Hz"
    )


def cmd_train(args):
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer

    store = SpeakerStore(args.corpus)
    recipe = _build_recipe(args, store)
    trainer = Trainer(recipe, store, workdir=args.workdir)
    print(f"run dir: {trainer.dir}")
    state = trainer.restore() if args.resume else None
    trainer.fit(state)


def _trainer_for(args, store, recipe):
    from amss_tpu.train.engine import Trainer

    return Trainer(
        recipe, store, workdir=args.workdir, run_dir=getattr(args, "run_dir", None)
    )


def _load_for_inference(args, store):
    """(model, params, recipe): from --run-dir's config.json when given (the
    authoritative record of what was trained), else from the CLI flags."""
    if getattr(args, "run_dir", None):
        import json as _json

        from amss_tpu.train.engine import load_model_from_run
        from amss_tpu.utils.config import recipe_from_dict

        model, params = load_model_from_run(args.run_dir)
        with open(os.path.join(args.run_dir, "config.json")) as f:
            recipe = recipe_from_dict(_json.load(f))
        return model, params, recipe
    recipe = _build_recipe(args, store)
    trainer = _trainer_for(args, store, recipe)
    state = trainer.restore(best=True)
    # EMA runs serve the averaged weights — the ones validation ranked
    # ckpt_best by (same contract as load_model_from_run's --run-dir path).
    return trainer.model, state.get("ema_params", state["params"]), recipe


def cmd_evaluate(args):
    import numpy as np
    from jax.numpy import asarray as jnp_asarray

    from amss_tpu.data.mixer import Mixer
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator

    store = SpeakerStore(args.corpus)
    model, params, recipe = _load_for_inference(args, store)
    mixer = Mixer(
        store,
        nb_speakers=recipe.model.nb_speakers,
        chunk_samples=recipe.train.chunk_samples,
        seed=recipe.train.seed,
    )
    mixes, refs = [], []
    noise_rng = np.random.default_rng(1234)  # deterministic noisy eval
    for i in range(args.n_mixtures):
        hb = mixer.batch("test", i, 1)
        refs.append(hb.sources[0])
        if getattr(args, "reverb_rt60", None) is not None:
            # reverberant eval: per-source synthetic rooms at a pinned RT60,
            # deterministic per mixture; metrics stay against the DRY refs
            import jax

            from amss_tpu.models.front import reverberate_sources

            rt = int(round(args.reverb_rt60 * recipe.sample_rate))
            wet = reverberate_sources(
                jnp_asarray(hb.sources[:1]),
                jax.random.fold_in(jax.random.PRNGKey(1234), i),
                (rt, rt),
            )
            m = np.asarray(wet[0]).sum(0)
        else:
            m = hb.sources[0].sum(0)
        if getattr(args, "noise_snr", None) is not None:
            noise = noise_rng.standard_normal(m.shape).astype(np.float32)
            scale = (np.sqrt(np.mean(m**2)) * 10.0 ** (-args.noise_snr / 20.0)
                     / max(np.sqrt(np.mean(noise**2)), 1e-9))
            m = m + noise * scale
        mixes.append(m)
    sep = StreamingSeparator(model, params, sample_rate=recipe.sample_rate)
    est = sep.separate_all(mixes)
    out = evaluate_separation(
        np.stack(est), np.stack(refs), np.stack(mixes), per_utt=True,
        with_stoi=getattr(args, "stoi", False),
        sample_rate=recipe.sample_rate,
    )
    # CI noise floor at small n (stderr ~0.6 dB at n=32) — surface it so CLI
    # users read comparisons with the same error bars the PARITY tables carry
    out.pop("si_sdri_per_utt", None)
    out.pop("sdri_per_utt", None)
    out["rtf"] = sep.meter.rtf
    out["utterances_per_sec"] = sep.meter.utterances_per_sec
    print(json.dumps(out))


def _write_separated(wav_paths, ests, out_dir, sample_rate, rtf):
    from amss_tpu.infer.evaluate import write_wav

    os.makedirs(out_dir, exist_ok=True)
    for path, est in zip(wav_paths, ests):
        base = os.path.splitext(os.path.basename(path))[0]
        for s in range(est.shape[0]):
            write_wav(os.path.join(out_dir, f"{base}_spk{s}.wav"), est[s],
                      sample_rate)
    print(f"wrote {sum(e.shape[0] for e in ests)} wavs to {out_dir} "
          f"(rtf={rtf:.4f})")


def cmd_separate(args):
    from amss_tpu.data.store import SpeakerStore, _read_wav
    from amss_tpu.infer.streaming import StreamingSeparator

    store = SpeakerStore(args.corpus)
    model, params, recipe = _load_for_inference(args, store)
    waves = [_read_wav(p)[0] for p in args.wav]
    if getattr(args, "num_speakers", None) == "auto":
        # Blind speaker count (infer/count.py): estimate k per mixture from
        # the embedding spectrum, then cluster each group with its own k.
        # Clustering models only — mask-head models emit a fixed S.
        import numpy as np

        from amss_tpu.infer.count import count_speakers

        if not (hasattr(model, "embed") or hasattr(model, "heads")):
            raise SystemExit(
                "--num-speakers auto needs an embedding model (dpcl/chimera); "
                f"recipe {args.recipe!r} is kind {recipe.model.kind!r}"
            )
        ks = [
            int(count_speakers(model, params, w[None, :],
                               k_max=args.max_speakers,
                               weight_kind=getattr(args, "count_weights",
                                                   "vad"))[0])
            for w in waves
        ]
        print(json.dumps({"estimated_speakers": dict(zip(args.wav, ks))}))
        ests: list = [None] * len(waves)
        rtfs = []
        for k in sorted(set(ks)):
            idx = [i for i, ki in enumerate(ks) if ki == k]
            sep = StreamingSeparator(
                model, params, sample_rate=recipe.sample_rate,
                separate_kwargs={"n_speakers": k},
            )
            for i, est in zip(idx, sep.separate_all([waves[i] for i in idx])):
                ests[i] = est
            rtfs.append(sep.meter.rtf)
        _write_separated(args.wav, ests, args.out, recipe.sample_rate,
                         max(rtfs))
        return
    kw = {}
    if getattr(args, "num_speakers", None) not in (None, "auto"):
        k = int(args.num_speakers)
        if k != recipe.model.nb_speakers:
            if not hasattr(model, "embed"):
                raise SystemExit(
                    f"recipe {args.recipe!r} ({recipe.model.kind}) emits a "
                    f"fixed {recipe.model.nb_speakers} sources; only "
                    "clustering models (dpcl) separate at a different k"
                )
            kw["n_speakers"] = k
    mesh = None
    if getattr(args, "mesh_devices", None):
        from amss_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_devices)
    sep = StreamingSeparator(model, params, sample_rate=recipe.sample_rate,
                             separate_kwargs=kw, mesh=mesh)
    ests = sep.separate_all(waves)
    _write_separated(args.wav, ests, args.out, recipe.sample_rate,
                     sep.meter.rtf)


def cmd_export(args):
    """AOT-export the trained serving function (StableHLO + params) into a
    self-contained directory runnable without model code (infer/export.py)."""
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.infer.export import export_serving
    from amss_tpu.utils.config import recipe_to_dict

    store = SpeakerStore(args.corpus)
    model, params, recipe = _load_for_inference(args, store)
    if args.realtime:
        from amss_tpu.infer.export import export_realtime

        export_realtime(
            model,
            params,
            args.out,
            chunk_samples=args.rt_chunk,
            n_streams=args.rt_streams,
            platforms=tuple(args.platforms),
            sample_rate=recipe.sample_rate,
            recipe_dict=recipe_to_dict(recipe),
            quantize=args.quantize,
        )
    else:
        export_serving(
            model,
            params,
            args.out,
            lengths=tuple(args.lengths),
            batch=args.serve_batch,
            platforms=tuple(args.platforms),
            sample_rate=recipe.sample_rate,
            recipe_dict=recipe_to_dict(recipe),
            quantize=args.quantize,
        )
    sizes = {
        f: os.path.getsize(os.path.join(args.out, f))
        for f in sorted(os.listdir(args.out))
    }
    print(json.dumps({"export_dir": args.out, "files": sizes}))


def cmd_separate_exported(args):
    """Separate WAVs through an exported serving artifact — the deployment
    path: no recipe, no corpus, no model classes."""
    from amss_tpu.data.store import _read_wav
    from amss_tpu.infer.export import RealtimeArtifact, ServingArtifact

    with open(os.path.join(args.export_dir, "export_meta.json")) as f:
        kind = json.load(f).get("kind", "offline")
    waves = [_read_wav(p)[0] for p in args.wav]
    if kind == "realtime":
        art = RealtimeArtifact(args.export_dir)
        if art.b == 1:
            ests = [art.separate_stream(w) for w in waves]
        else:  # multi-stream artifact: serve the wavs in groups of B slots
            ests = []
            for i in range(0, len(waves), art.b):
                group = waves[i : i + art.b]
                ests.extend(art.separate_streams(group)[: len(group)])
        rtf = float("nan")  # streamed path; see bench realtime fields
    else:
        art = ServingArtifact(args.export_dir)
        ests = art.separate_all(waves)
        rtf = art.meter.rtf
    _write_separated(args.wav, ests, args.out, art.sample_rate, rtf)


def _parse_grid(specs: list[str]) -> list[dict]:
    """["lr=1e-3,3e-4", "expansion=2,4"] -> cartesian product of override
    dicts (4 combos).  Values auto-typed: int, then float, then true/false,
    else string."""
    import itertools

    def typed(v: str):
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        return v

    axes = []
    for spec in specs:
        if "=" not in spec:
            raise SystemExit(f"--grid entries are key=v1,v2,... (got {spec!r})")
        key, vals = spec.split("=", 1)
        key = key.replace("-", "_")
        axes.append([(key, typed(v)) for v in vals.split(",") if v != ""])
    return [dict(combo) for combo in itertools.product(*axes)]


def cmd_sweep(args):
    """Sequential hyperparameter sweep: train + evaluate every grid combo,
    emit one JSON line per combo and a final ranking.  Grid keys are the
    train-override flag names (lr, expansion, trunk, ema-decay, ...)."""
    import copy

    import numpy as np

    from amss_tpu.data.mixer import Mixer
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.infer.streaming import StreamingSeparator
    from amss_tpu.train.engine import Trainer

    store = SpeakerStore(args.corpus)
    combos = _parse_grid(args.grid)
    rows = []
    for i, combo in enumerate(combos):
        a = copy.copy(args)
        for k, v in combo.items():
            if not hasattr(a, k):
                raise SystemExit(f"unknown grid key {k!r} (not a train flag)")
            setattr(a, k, v)
        recipe = _build_recipe(a, store)
        tr = Trainer(recipe, store, workdir=args.workdir)
        print(json.dumps({"combo": combo, "run_dir": tr.dir,
                          "status": f"training {i + 1}/{len(combos)}"}),
              flush=True)
        state = tr.fit()
        params = state.get("ema_params", state["params"])

        mixer = Mixer(store, nb_speakers=recipe.model.nb_speakers,
                      chunk_samples=recipe.train.chunk_samples,
                      seed=recipe.train.seed)
        mixes, refs = [], []
        for j in range(args.n_mixtures):
            hb = mixer.batch("test", j, 1)
            refs.append(hb.sources[0])
            mixes.append(hb.sources[0].sum(0))
        sep = StreamingSeparator(tr.model, params,
                                 sample_rate=recipe.sample_rate)
        est = sep.separate_all(mixes)
        q = evaluate_separation(np.stack(est), np.stack(refs),
                                np.stack(mixes), bss=False)
        row = {"combo": combo, "run_dir": tr.dir, "step": state["step"],
               "si_sdri": round(q["si_sdri"], 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: -r["si_sdri"])
    print(json.dumps({"ranking": rows}), flush=True)


def cmd_serve(args):
    """HTTP serving daemon over an exported artifact (infer/server.py)."""
    from amss_tpu.infer.server import SeparationServer

    srv = SeparationServer(args.export_dir, host=args.host, port=args.port)
    print(json.dumps({"serving": args.export_dir, "kind": srv.kind,
                      "host": args.host, "port": srv.port}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


def cmd_profile(args):
    """Trace N train steps with jax.profiler (Perfetto/TensorBoard-loadable)
    and print wall-clock step stats (SURVEY.md §5.1)."""
    import jax
    import jax.numpy as jnp

    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer
    from amss_tpu.utils.profiling import StepTimer, trace

    store = SpeakerStore(args.corpus)
    recipe = _build_recipe(args, store)
    tr = Trainer(recipe, store, workdir=args.workdir)
    state = tr.init_state()
    tr._build_step()
    p, o = state["params"], state["opt_state"]
    e = state.get("ema_params")  # EMA runs: the step carries a 3rd donated tree
    cf = tr.corpus.flat if tr.corpus is not None else None

    def one_step(p, o, e, batch, i):
        if e is not None:
            return tr._step_fn(p, o, e, batch, cf, jnp.float32(1.0), jnp.int32(i))
        p, o, m = tr._step_fn(p, o, batch, cf, jnp.float32(1.0), jnp.int32(i))
        return p, o, None, m

    batch = tr._device_batch(tr._draw("train", 0, recipe.train.batch_size))
    # warm (compile outside the trace)
    p, o, e, m = one_step(p, o, e, batch, 0)
    _ = {k: float(v) for k, v in m.items()}

    timer = StepTimer()
    with trace(args.trace_dir):
        timer.start()
        for i in range(args.profile_steps):
            batch = tr._device_batch(tr._draw("train", i + 1, recipe.train.batch_size))
            p, o, e, m = one_step(p, o, e, batch, i + 1)
            _ = {k: float(v) for k, v in m.items()}  # host fetch = sync
            timer.tick()
    stats = {k: round(v, 5) for k, v in timer.stats().items()}
    print(json.dumps({"trace_dir": args.trace_dir, **stats}))


def main(argv=None):
    # --platform must act BEFORE any jax dispatch: the axon sitecustomize
    # force-sets jax_platforms="axon,cpu" at interpreter start, and a dead
    # TPU tunnel then hangs every CLI command with no user-facing escape
    # (observed: a tunnel outage left `train` blocked at 0% CPU).  The env
    # var alone cannot override the sitecustomize, so this is the only
    # reliable CPU fallback switch.
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--platform" in argv:
        i = argv.index("--platform")
        platform = argv[i + 1]
        del argv[i : i + 2]
        if platform != "default":
            import jax

            jax.config.update("jax_platforms", platform)
    try:  # persistent XLA cache: tunnel compiles cost minutes (utils/cache.py)
        from amss_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    from amss_tpu.configs.recipes import ALL_RECIPES

    ap = argparse.ArgumentParser(prog="amss_tpu")
    # Handled (and stripped) above, before jax initializes; registered here
    # only so --help documents it.  Works in any argv position.
    ap.add_argument("--platform", choices=["axon", "cpu", "default"],
                    default="default",
                    help="jax platform override; 'cpu' runs the CLI without "
                         "the TPU (e.g. during a tunnel outage)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("make-synthetic")
    p.add_argument("--out", required=True)
    p.add_argument("--speakers", type=int, default=12)
    p.add_argument("--seconds", type=float, default=30.0)
    p.set_defaults(fn=cmd_make_synthetic)

    p = sub.add_parser("ingest")
    p.add_argument("--wav-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--sample-rate", type=int, default=None,
                   help="store rate; files at other rates are resampled "
                        "(default: adopt the first file's rate)")
    p.set_defaults(fn=cmd_ingest)

    for name, fn in [("train", cmd_train), ("evaluate", cmd_evaluate),
                     ("separate", cmd_separate), ("profile", cmd_profile),
                     ("export", cmd_export), ("sweep", cmd_sweep)]:
        p = sub.add_parser(name)
        p.add_argument("--recipe", required=True,
                       choices=sorted(ALL_RECIPES))
        p.add_argument("--corpus", required=True)
        p.add_argument("--workdir", default="runs")
        p.add_argument("--pretrained-front")
        p.add_argument("--base-run", help="frozen base separator run dir (enh)")
        p.add_argument("--run-dir", help="explicit run directory (evaluate/separate)")
        p.add_argument("--resume", action="store_true")
        _add_train_overrides(p)
        if name == "evaluate":
            p.add_argument("--n-mixtures", type=int, default=32)
            p.add_argument("--stoi", action="store_true",
                           help="also report STOI intelligibility (first-"
                                "party, ops/stoi.py)")
            p.add_argument("--noise-snr", type=float, default=None,
                           help="corrupt the test mixtures with white noise "
                                "at this SNR (dB) before separation — the "
                                "noisy-robustness evaluation; metrics stay "
                                "against the clean references")
            p.add_argument("--reverb-rt60", type=float, default=None,
                           help="reverberate each test source with its own "
                                "synthetic RIR at this RT60 (seconds) before "
                                "mixing — the reverb-robustness evaluation; "
                                "metrics stay against the dry references")
        if name == "separate":
            p.add_argument("--wav", nargs="+", required=True)
            p.add_argument("--out", default="separated")
            p.add_argument("--num-speakers", default=None,
                           help="output source count: an int (clustering "
                                "models separate at any k with the same "
                                "weights) or 'auto' (blind per-mixture "
                                "eigengap estimate, infer/count.py); default "
                                "= the recipe's nb_speakers")
            p.add_argument("--max-speakers", type=int, default=4,
                           help="upper bound for --num-speakers auto")
            p.add_argument("--count-weights", default="vad",
                           choices=["vad", "magnitude", "magvad"],
                           help="bin weighting for the --num-speakers auto "
                                "eigengap Gram; magnitude/magvad emphasize "
                                "loud bins (measured to sharpen counting)")
            p.add_argument("--mesh-devices", type=int, default=None,
                           help="time-parallel long-audio inference: shard "
                                "over-bucket utterances' chunk axis across "
                                "this many devices (infer/long.py::"
                                "separate_long_sharded); default = single "
                                "device")
        if name == "profile":
            p.add_argument("--profile-steps", type=int, default=20)
            p.add_argument("--trace-dir", default="/tmp/amss_trace")
        if name == "sweep":
            p.add_argument("--grid", nargs="+", required=True,
                           help="axes as key=v1,v2 (flag names, e.g. "
                                "lr=1e-3,3e-4 expansion=2,4); cartesian "
                                "product is trained sequentially")
            p.add_argument("--n-mixtures", type=int, default=32)
        if name == "export":
            p.add_argument("--out", required=True,
                           help="serving-artifact output directory")
            p.add_argument("--lengths", type=int, nargs="+",
                           default=[16384, 65536],
                           help="bucket lengths (samples) to AOT-compile")
            p.add_argument("--serve-batch", type=int, default=8)
            p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"],
                           help="jax.export lowering platforms")
            p.add_argument("--realtime", action="store_true",
                           help="export the causal streaming step (c7-style "
                                "models) instead of offline bucket serving")
            p.add_argument("--rt-chunk", type=int, default=4096,
                           help="realtime export: samples per push")
            p.add_argument("--rt-streams", type=int, default=1,
                           help="realtime export: concurrent streams per push")
            p.add_argument("--quantize", choices=["int8"], default=None,
                           help="int8-compress the params blob (~4x smaller "
                                "artifact; infer/quantize.py — loader "
                                "dequantizes, programs unchanged)")
        p.set_defaults(fn=fn)

    p = sub.add_parser(
        "separate-exported",
        help="separate WAVs through an AOT serving artifact (no model code)",
    )
    p.add_argument("--export-dir", required=True)
    p.add_argument("--wav", nargs="+", required=True)
    p.add_argument("--out", default="separated")
    p.set_defaults(fn=cmd_separate_exported)

    p = sub.add_parser(
        "serve",
        help="HTTP serving daemon over an exported artifact (no model code)",
    )
    p.add_argument("--export-dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
