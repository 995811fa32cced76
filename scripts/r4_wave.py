"""Round-4 experiment driver (VERDICT.md r3 items 1, 3).

Stages:
  perf_probe — device-utilization truth (VERDICT r3 item 1): decompose the
               tunnel's fixed round trip, per-buffer (leaf-count) overhead,
               per-byte bandwidth (H2D + D2H), and TRUE device execution
               time for the train step and the serving batch, via
               sync-vs-pipelined timing at several batch/chunk/dtype shapes,
               plus a jax.profiler trace attempt.
  flagship3  — the >=10 dB push (item 3): exp4 TCN on the 500-spk corpus at
               a 96k schedule with parameter EMA; raw AND ema weights
               bootstrap-evaluated at n=200.  `flagship3 [steps] [decay]`.

Shared helpers (corpora, train(), blind_eval, sized) come from r3_wave.
Results append to quality_results.jsonl (committed — survives restarts).
"""

import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("AMSS_WAVE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from r3_wave import (  # noqa: E402
    REPO,
    V2,
    V2BIG,
    V2MAX,
    blind_eval,
    ensure_corpora,
    log_result,
    sized,
    train,
)


def _med(fn, reps=8, warm=2):
    """Median/min wall seconds of fn() after warmup."""
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts))


def _probe_rtt(out):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    med, mn = _med(lambda: np.asarray(f(x)), reps=20)
    out["rtt_ms"] = round(1e3 * med, 2)
    out["rtt_ms_min"] = round(1e3 * mn, 2)
    return med


def _probe_bandwidth(out, rtt):
    """Per-byte cost of the tunnel, both directions, at 64 KB..16 MB."""
    import jax
    import jax.numpy as jnp

    touch = jax.jit(lambda v: v[:4] * 1.0)
    for nbytes in (1 << 16, 1 << 20, 1 << 23, 1 << 24):
        n = nbytes // 4
        a = np.random.default_rng(0).standard_normal(n).astype(np.float32)

        def h2d():
            d = jax.device_put(a)
            np.asarray(touch(d))  # force arrival + 1 fetch

        med, _ = _med(h2d, reps=5)
        xfer = max(med - rtt, 1e-9)
        out[f"h2d_ms_{nbytes >> 20}mb" if nbytes >= 1 << 20
            else f"h2d_ms_{nbytes >> 10}kb"] = round(1e3 * med, 2)
        out[f"h2d_mbps_{nbytes >> 20}mb" if nbytes >= 1 << 20
            else f"h2d_mbps_{nbytes >> 10}kb"] = round(nbytes / xfer / 1e6, 1)

        # fresh device value each rep (np.asarray on a fetched jax.Array is
        # cached host-side, which would measure memcpy, not the tunnel)
        fill = jax.jit(lambda i, n=n: jnp.full((n,), i, jnp.float32))
        k = [0]

        def d2h():
            k[0] += 1
            np.asarray(fill(k[0]))

        med, _ = _med(d2h, reps=5)
        xfer = max(med - rtt, 1e-9)
        out[f"d2h_ms_{nbytes >> 20}mb" if nbytes >= 1 << 20
            else f"d2h_ms_{nbytes >> 10}kb"] = round(1e3 * med, 2)
        out[f"d2h_mbps_{nbytes >> 20}mb" if nbytes >= 1 << 20
            else f"d2h_mbps_{nbytes >> 10}kb"] = round(nbytes / xfer / 1e6, 1)


def _probe_leaves(out, rtt):
    """Per-buffer (pytree leaf) overhead of one dispatch: k small inputs and
    k small outputs — the suspected cause of bench's 893 ms 'train step'
    (params tree ~100 leaves passed + grads tree ~100 leaves returned)."""
    import jax
    import jax.numpy as jnp

    for k in (1, 32, 128):
        f = jax.jit(lambda x, k=k: tuple(x + float(i) for i in range(k)))
        x = jnp.zeros((8,), jnp.float32)
        med, _ = _med(lambda: np.asarray(f(x)[-1]), reps=6)
        out[f"call_ms_out{k}"] = round(1e3 * med, 2)

        xs = [jnp.zeros((8,), jnp.float32) for _ in range(k)]
        g = jax.jit(lambda *v: sum(v))
        med, _ = _med(lambda: np.asarray(g(*xs)), reps=6)
        out[f"call_ms_in{k}"] = round(1e3 * med, 2)


def _flagship_parts(compute_dtype="float32"):
    from amss_tpu.configs.recipes import c6_tasnet
    from amss_tpu.train.engine import make_model

    r = sized(c6_tasnet(), 100, expansion=4, compute_dtype=compute_dtype)
    model = make_model(r.model)
    import jax

    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _probe_train_step(out, rtt):
    """The 80 ms/step question (stepscan_ab was flat across K=1/4/16): is it
    device execution or tunnel accounting?  Three timings per shape:
      sync      — fetch the loss every call (what bench.py r3 measured);
      pipelined — N calls dispatched back-to-back, one fetch at the end:
                  upper bound on device time per step if dispatch pipelines;
      donated   — fit()-style: params donated through a chained update, so
                  the tunnel holds one live state and per-call buffer
                  traffic is minimal.
    """
    import jax
    import jax.numpy as jnp

    from amss_tpu.utils.profiling import compiled_flops, mfu

    for tag, bt, ct, dtype in (
        ("b16_f32", 16, 16384, "float32"),
        ("b4_f32", 4, 16384, "float32"),
        ("b64_f32", 64, 16384, "float32"),
        ("b16_bf16", 16, 16384, "bfloat16"),
        ("b16_c64k_f32", 16, 65536, "float32"),
    ):
        model, params = _flagship_parts(dtype)

        def loss_fn(p, sources):
            l, _ = model.loss_from_batch(p, {"sources": sources})
            return l

        src = jax.device_put(
            np.random.default_rng(1).standard_normal((bt, 2, ct))
            .astype(np.float32) * 0.1)
        vag = jax.value_and_grad(loss_fn)

        # style A: loss+grads returned per call, loss fetched (bench r3)
        gA = jax.jit(vag)
        lv, _ = gA(params, src)
        np.asarray(lv)
        med, _ = _med(lambda: np.asarray(gA(params, src)[0]), reps=6)
        out[f"train_{tag}_sync_ms"] = round(1e3 * med, 1)

        # style A pipelined: dispatch 8, fetch the last loss only
        def pipe():
            last = None
            for _ in range(8):
                last, _ = gA(params, src)
            np.asarray(last)

        med, _ = _med(pipe, reps=3, warm=1)
        out[f"train_{tag}_pipe_ms"] = round(1e3 * med / 8, 1)

        # style B: donated chained update (state lives on device, like fit())
        def stepB(p, s):
            l, g = vag(p, s)
            newp = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
            return newp, l

        gB = jax.jit(stepB, donate_argnums=(0,))
        p = jax.tree_util.tree_map(jnp.asarray, params)
        p, lv = gB(p, src)
        np.asarray(lv)
        t0 = time.perf_counter()
        for _ in range(10):
            p, lv = gB(p, src)
        np.asarray(lv)
        out[f"train_{tag}_donated_ms"] = round(
            1e3 * (time.perf_counter() - t0) / 10, 1)

        try:
            fl = compiled_flops(vag, params, src)
            m = mfu(fl, out[f"train_{tag}_donated_ms"] / 1e3)
            out[f"train_{tag}_gflops"] = round(fl / 1e9, 1)
            out[f"train_{tag}_mfu_donated"] = round(m["mfu_vs_v5e_peak"], 5)
        except Exception as e:
            out[f"train_{tag}_mfu_error"] = repr(e)[:80]
        del p, src


def _probe_serving(out, rtt):
    """Three-way split for the serving batch: wall = rtt + bytes/bw +
    device.  Device time isolated by keeping inputs device-resident and
    fetching only 4 floats; transfer measured by the full in/out path."""
    import jax
    import jax.numpy as jnp

    from amss_tpu.train.engine import load_model_from_run

    path = os.path.join(REPO, "checkpoints", "c6_flagship")
    model, params = load_model_from_run(path)
    b, t = 8, 64000
    mix_host = (np.random.default_rng(0).standard_normal((b, t))
                .astype(np.float32) * 0.3)
    sep = jax.jit(lambda p, m: model.separate(p, m))
    mix_dev = jax.device_put(mix_host)
    np.asarray(sep(params, mix_dev))  # compile

    # full path: host in -> separated audio host out (what serving pays)
    med_full, _ = _med(lambda: np.asarray(
        sep(params, jax.device_put(mix_host))), reps=5)
    # device-only: resident input, 4-float fetch
    tiny = jax.jit(lambda p, m: model.separate(p, m)[:, :, :1].sum())
    np.asarray(tiny(params, mix_dev))
    med_dev, _ = _med(lambda: np.asarray(tiny(params, mix_dev)), reps=5)
    out["serve_b8_full_ms"] = round(1e3 * med_full, 1)
    out["serve_b8_device_ms"] = round(1e3 * (med_dev - rtt), 1)
    out["serve_b8_bytes_in"] = b * t * 4
    out["serve_b8_bytes_out"] = b * 2 * t * 4
    out["serve_b8_transfer_ms_est"] = round(
        1e3 * (med_full - med_dev), 1)


def _probe_trace(out):
    """jax.profiler trace of 3 pipelined train steps; aggregate the chrome
    trace by event name if the axon backend emits one."""
    import glob
    import gzip

    import jax

    trace_dir = "/tmp/amss_trace_r4"
    try:
        model, params = _flagship_parts()

        def loss_fn(p, sources):
            l, _ = model.loss_from_batch(p, {"sources": sources})
            return l

        src = jax.device_put(
            np.random.default_rng(1).standard_normal((16, 2, 16384))
            .astype(np.float32) * 0.1)
        g = jax.jit(jax.value_and_grad(loss_fn))
        np.asarray(g(params, src)[0])
        with jax.profiler.trace(trace_dir):
            last = None
            for _ in range(3):
                last, _ = g(params, src)
            np.asarray(last)
        paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
        if not paths:
            out["trace"] = "no trace.json.gz produced"
            return
        ev = json.load(gzip.open(sorted(paths)[-1]))["traceEvents"]
        pids = {e["pid"]: e["args"].get("name", "")
                for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"}
        agg = {}
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                key = (pids.get(e["pid"], str(e["pid"]))[:40], e["name"][:60])
                agg[key] = agg.get(key, 0.0) + e["dur"] / 1e3
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
        out["trace_top_ms"] = [
            {"plane": k[0], "op": k[1], "ms": round(v, 2)} for k, v in top]
    except Exception as e:
        out["trace_error"] = repr(e)[:200]


def stage_perf_probe():
    out = {"stage": "perf_probe_r4"}
    rtt = _probe_rtt(out)
    for name, fn in (("bandwidth", _probe_bandwidth),
                     ("leaves", _probe_leaves),
                     ("train_step", _probe_train_step),
                     ("serving", _probe_serving)):
        try:
            fn(out, rtt)
        except Exception as e:
            out[f"{name}_error"] = repr(e)[:200]
        log_result(dict(out))  # incremental: partial results survive a hang
    _probe_trace(out)
    log_result(out)


def stage_serve_bisect():
    """Where do the serving batch's 1.3 device-seconds go?  (perf_probe: the
    b8 x 8 s flagship separate() costs ~23x the equivalent-token train step.)
    Times each stage of the forward — encode, features, trunk, masks, decode
    — at the train shape and the serve shape, pipelined x8, fetch-4-floats."""
    import jax
    import jax.numpy as jnp

    from amss_tpu.train.engine import load_model_from_run

    model, params = load_model_from_run(
        os.path.join(REPO, "checkpoints", "c6_flagship"))
    out = {"stage": "serve_bisect_r4"}

    def timed(tag, fn, *args):
        g = jax.jit(lambda *a: jnp.sum(fn(*a)[..., :1]))
        np.asarray(g(*args))  # compile
        t0 = time.perf_counter()
        for _ in range(8):
            r = g(*args)
        np.asarray(r)
        out[tag] = round(1e3 * (time.perf_counter() - t0) / 8, 1)

    for shape_tag, b, t in (("train16k", 16, 16384), ("serve64k", 8, 64000)):
        mix = jax.device_put(
            np.random.default_rng(0).standard_normal((b, t))
            .astype(np.float32) * 0.3)
        codes, aux = model.front.encode(params["front"], mix)
        feats = model.front.features(params["front"], codes)
        nf = model.cfg.front.frames_for(t)
        fmask = jax.device_put(np.ones((b, nf), np.float32))
        m = model.masks(params, feats, fmask)
        # codes/feats/m are already device arrays from the eager calls above;
        # aux must stay as returned (its scalar leaves are Python values the
        # decode path expects — an np.asarray round-trip makes them 0-d
        # arrays and breaks aux_b's [:, None]).

        timed(f"{shape_tag}_encode_ms",
              lambda mm: model.front.encode(params["front"], mm)[0], mix)
        timed(f"{shape_tag}_features_ms",
              lambda cc: model.front.features(params["front"], cc), codes)
        timed(f"{shape_tag}_trunk_ms",
              lambda ff: model.trunk(params["separator"], ff, None), feats)
        timed(f"{shape_tag}_trunk_fmask_ms",
              lambda ff, fm: model.trunk(params["separator"], ff, fm),
              feats, fmask)
        timed(f"{shape_tag}_masks_ms",
              lambda ff: model.masks(params, ff, None), feats)
        timed(f"{shape_tag}_decode_ms",
              lambda cc, mm_: model.apply_masks_and_decode(
                  params, cc, aux, mm_, t), codes, m)
        timed(f"{shape_tag}_full_ms",
              lambda mm: model.separate(params, mm), mix)
        timed(f"{shape_tag}_full_fmask_ms",
              lambda mm, fm: model.separate(params, mm, frame_mask=fm),
              mix, fmask)
        log_result(dict(out))
    log_result(out)


def stage_flagship3():
    """`flagship3 [steps] [decay]` — exp4 on the proven 500-spk corpus, long
    schedule + parameter EMA; the measured trajectory (flagship2b 48k read
    9.99 [9.71, 10.27] n=200) needs ~+0.3 dB for an unambiguous CI floor."""
    i = sys.argv.index("flagship3")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 96000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    r = sized(c6_recipe(), steps, expansion=4)
    # device_data: post-fix the 27 ms device step is host-input-bound on the
    # 1-vCPU host (measured 17-24 steps/s host path vs ~37 device cap);
    # HBM-resident corpus moves mixing on-device (equal-trajectory tested).
    r = dc.replace(r, train=dc.replace(r.train, ema_decay=decay,
                                       device_data=True))
    _train_and_eval_both(r, f"flagship3_exp4_max_{steps // 1000}k", steps)


def stage_flagship3b():
    """`flagship3b [steps] [decay]` — the short-filter upside arm: Conv-TasNet
    measured L=16 beating L=32 by ~0.7 dB on WSJ0-2mix (Luo & Mesgarani 2019
    table 1); halving filter_len/stride doubles trunk frames, affordable
    after the r4 encoder fixes.  Same corpus/EMA protocol as flagship3."""
    i = sys.argv.index("flagship3b")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 48000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    r = sized(c6_recipe(), steps, expansion=4)
    r = dc.replace(
        r,
        model=dc.replace(
            r.model,
            front=dc.replace(r.model.front, filter_len=16, stride=8)),
        train=dc.replace(r.train, ema_decay=decay, device_data=True),
    )
    _train_and_eval_both(r, f"flagship3b_L16_max_{steps // 1000}k", steps)


def stage_c7refresh():
    """`c7refresh [steps] [decay]` — causal flagship at the r4 protocol:
    exp4 repeats=3 (the r3 c7v2 capacity), 500-spk corpus (the 2-mix
    de-confound measured v2max > v2giant by ~0.5 dB at equal arch/steps),
    48k schedule + EMA + HBM-resident corpus.  Committed c7_causal to beat:
    8.54 [8.25, 8.82] (c7v2_exp4_giant_32k)."""
    from amss_tpu.configs.recipes import c7_realtime

    i = sys.argv.index("c7refresh")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 48000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    r = sized(c7_realtime(), steps, expansion=4, repeats=3)
    r = dc.replace(r, train=dc.replace(r.train, ema_decay=decay,
                                       device_data=True))
    _train_and_eval_both(r, f"c7refresh_exp4_max_{steps // 1000}k", steps)


def stage_flagship3spk():
    """`flagship3spk [steps] [decay]` — 3-speaker flagship refresh: the
    committed checkpoints/c6_3spk is the r3 16k-step run (v2test3 +9.12
    n=200); same exp4 arch at the r4 protocol (48k, EMA, HBM-resident
    corpus) on the 500-spk corpus.  Evaluated on 3-mix test draws."""
    i = sys.argv.index("flagship3spk")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 48000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    r = sized(c6_recipe(), steps, expansion=4)
    r = dc.replace(
        r,
        model=dc.replace(r.model, nb_speakers=3),
        train=dc.replace(r.train, ema_decay=decay, device_data=True),
    )
    _train_and_eval_both(r, f"flagship3spk_exp4_max_{steps // 1000}k", steps)


def stage_dpt_flagship():
    """`dpt_flagship [steps] [decay]` — the DPT trunk at the full r4 flagship
    protocol: the 24k probe read 9.37 [8.97, 9.79] n=64 still scaling with
    steps (`dpt_probe_24k_v2test`), unoptimized and without EMA / the L16
    front / the HBM corpus.  This arm applies all three (the protocol that
    took the TCN trunk 9.99→11.49) so the trunks compare at equal protocol."""
    i = sys.argv.index("dpt_flagship")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 48000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    r = sized(c6_recipe(), steps, trunk="dpt", hidden=192, blocks=6,
              chunk_frames=32, heads=4, expansion=4, dropout=0.1)
    r = dc.replace(
        r,
        model=dc.replace(
            r.model,
            front=dc.replace(r.model.front, filter_len=16, stride=8)),
        train=dc.replace(r.train, ema_decay=decay, device_data=True),
    )
    _train_and_eval_both(r, f"dpt_flagship_L16_max_{steps // 1000}k", steps)


def stage_flagship3spk_l16():
    """`flagship3spk_l16 [steps] [decay]` — the round-5 lever NOTES_r4 names:
    the r4 flagship3spk refresh measured parity with c6_3spk at L32 while the
    2-mix lift (9.99→11.49) came from the L16 short-filter front (flagship3b);
    this arm applies that front to the 3-speaker protocol."""
    i = sys.argv.index("flagship3spk_l16")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 48000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    r = sized(c6_recipe(), steps, expansion=4)
    r = dc.replace(
        r,
        model=dc.replace(
            r.model, nb_speakers=3,
            front=dc.replace(r.model.front, filter_len=16, stride=8)),
        train=dc.replace(r.train, ema_decay=decay, device_data=True),
    )
    _train_and_eval_both(r, f"flagship3spk_L16_max_{steps // 1000}k", steps)


def stage_count_range():
    """`count_range [steps]` — round-5 queue item 3: the committed c1_count
    (count-diverse, trained k∈{1,2,3}) counts k=4 at only 0.41 zero-shot
    (`count_k4_zeroshot_n32`) while in-range training was the measured fix
    for k≤3 (`count_train_dpcl_12000_counting`: 0.98/1.00/0.84).  Retrain
    with nb_speakers=4 / train_min_speakers=1 so the training distribution
    covers the deployed range, then eval counting at ks=(1..4) with k_max=5
    plus a k=5 zero-shot row and the fixed-k separation-quality checks."""
    from r3_wave import count_accuracy, count_sep_eval_model

    i = sys.argv.index("count_range")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 12000
    from amss_tpu.configs.recipes import c1_stft_dpcl

    r = sized(c1_stft_dpcl(), steps)
    r = dc.replace(r, model=dc.replace(r.model, nb_speakers=4,
                                       train_min_speakers=1))
    tr, state, secs = train(r, V2MAX, workdir="runs_r4")
    name = f"count_range_dpcl_{steps}"
    out = blind_eval(tr.model, state["params"], V2MAX, n=64)
    out.update(stage=f"{name}_maxtest4", steps=steps, train_seconds=secs,
               run_dir=tr.dir)
    log_result(out)
    acc, confusion = count_accuracy(tr.model, state["params"], V2, 50,
                                    ks=(1, 2, 3, 4), k_max=5)
    log_result({"stage": f"{name}_counting", "accuracy": acc,
                "confusion": confusion, "k_max": 5, "run_dir": tr.dir})
    acc5, conf5 = count_accuracy(tr.model, state["params"], V2, 32,
                                 ks=(5,), k_max=6)
    log_result({"stage": f"{name}_k5_zeroshot", "accuracy": acc5,
                "confusion": conf5, "k_max": 6, "run_dir": tr.dir,
                "note": "k=5 is zero-shot: trained on k in {1..4}"})
    out = count_sep_eval_model(tr.model, state["params"], 32)
    out.update(stage=f"{name}_sep_eval", run_dir=tr.dir)
    log_result(out)


def stage_l41_l16():
    """`l41_l16 [steps] [decay]` — round-5 queue item 5b: enrolled L41 with
    the learned short-filter front.  `checkpoints/c3_l41` (13.18 enrolled)
    still runs the r1-era STFT front (win 256 / hop 64) while the L16
    adaptive front is what moved the blind flagship 9.99→11.49
    (`flagship3b_L16_max_48k_ema`).  Same protocol as r3's c3_modern
    (V2BIG 100-spk corpus, enrolled n=200 eval at unseen offsets with
    bootstrap CIs, blind k-means eval) plus parameter EMA; raw and ema arms
    both evaluated."""
    import jax
    import jax.numpy as jnp

    from amss_tpu.configs.recipes import c3_l41
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.utils.config import FrontConfig

    i = sys.argv.index("l41_l16")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 10000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    store = SpeakerStore(V2BIG)
    r = sized(c3_l41(n_train_speakers=len(store.speakers)), steps)
    r = dc.replace(
        r,
        model=dc.replace(
            r.model,
            front=FrontConfig(kind="adapt", n_filters=256, filter_len=16,
                              stride=8, pool=1)),
        train=dc.replace(r.train, ema_decay=decay),
    )
    tr, state, secs = train(r, V2BIG, workdir="runs_r4")

    n = 200
    mixes, refs, sids = [], [], []
    for j in range(n):
        hb = tr.mixer.batch("train", 10_000_000 + j, 1)
        refs.append(hb.sources[0])
        mixes.append(hb.sources[0].sum(0))
        sids.append(hb.speaker_ids[0])
    fn = jax.jit(lambda p, m, s: tr.model.separate(p, m, speaker_ids=s))
    for tag, p in (("raw", state["params"]), ("ema", state["ema_params"])):
        if p is None:
            continue
        est = np.asarray(fn(p, jnp.asarray(np.stack(mixes)),
                            jnp.asarray(np.stack(sids))))
        out = evaluate_separation(est, np.stack(refs), np.stack(mixes),
                                  per_utt=True)
        out.update(stage=f"l41_l16_{steps // 1000}k_enrolled_{tag}",
                   steps=steps, train_seconds=secs, run_dir=tr.dir)
        log_result(out)
        outb = blind_eval(tr.model, p, V2BIG, n=64)
        outb.update(stage=f"l41_l16_{steps // 1000}k_blind_{tag}",
                    steps=steps, run_dir=tr.dir)
        log_result(outb)


def stage_bf16_ab2():
    """`bf16_ab2 [steps]` — bf16 QUALITY A/B at the flagship protocol: the
    round-2 `bf16_ab` rows measured train speed only (623→435 s, 1.43×)
    with no quality number, so bf16 compute cannot honestly be recommended
    as the training default.  Two arms at equal steps/protocol (L16 front,
    EMA 0.999, HBM corpus): sep.compute_dtype float32 vs bfloat16 (params
    and optimizer state stay f32 — `base.py::_compute_dtype` mixed
    precision); raw+ema n=200 bootstrap evals each, train_seconds logged."""
    i = sys.argv.index("bf16_ab2")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 12000
    for dt in ("float32", "bfloat16"):
        r = sized(c6_recipe(), steps, expansion=4, compute_dtype=dt)
        r = dc.replace(
            r,
            model=dc.replace(
                r.model,
                front=dc.replace(r.model.front, filter_len=16, stride=8)),
            train=dc.replace(r.train, ema_decay=0.999, device_data=True),
        )
        _train_and_eval_both(r, f"bf16_ab2_{dt}_{steps // 1000}k", steps)


def stage_flagship3c():
    """`flagship3c [filter_len] [steps] [decay]` — short-filter scaling arm:
    flagship3b measured L=16 beating L=32 by ~0.45 dB at half the steps
    (`flagship3b_L16_max_48k_ema` 11.49 vs `flagship3_exp4_max_96k_ema`
    11.04), replicating the Luo & Mesgarani 2019 direction where quality
    kept rising down to ~2.5 ms filters.  This arm continues the sweep one
    octave down (default L=8 / stride 4 — 1 ms at 8 kHz), doubling trunk
    frames again.  Same protocol as flagship3b."""
    i = sys.argv.index("flagship3c")
    flen = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 8
    steps = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 48000
    decay = float(sys.argv[i + 3]) if len(sys.argv) > i + 3 else 0.999
    r = sized(c6_recipe(), steps, expansion=4)
    r = dc.replace(
        r,
        model=dc.replace(
            r.model,
            front=dc.replace(r.model.front, filter_len=flen,
                             stride=flen // 2)),
        train=dc.replace(r.train, ema_decay=decay, device_data=True),
    )
    _train_and_eval_both(r, f"flagship3c_L{flen}_max_{steps // 1000}k", steps)


def stage_dpt_default():
    """`dpt_default [steps] [decay]` — de-confound the dpt_flagship negative:
    that arm changed trunk AND front together (L16) and scored 8.76, below
    its own default-front 24k probe (9.37).  This arm keeps the DPT trunk
    identical but runs the recipe's DEFAULT front (L32/stride 16), isolating
    trunk-vs-trunk at the flagship protocol (48k + EMA + HBM corpus)."""
    i = sys.argv.index("dpt_default")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 48000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    r = sized(c6_recipe(), steps, trunk="dpt", hidden=192, blocks=6,
              chunk_frames=32, heads=4, expansion=4, dropout=0.1)
    r = dc.replace(r, train=dc.replace(r.train, ema_decay=decay,
                                       device_data=True))
    _train_and_eval_both(r, f"dpt_default_L32_max_{steps // 1000}k", steps)


def _train_and_eval_both(r, name, steps):
    tr, state, secs = train(r, V2MAX, workdir="runs_r4")
    for tag, p in (("raw", state["params"]), ("ema", state["ema_params"])):
        if p is None:
            continue
        out = blind_eval(tr.model, p, V2, n=200)
        out.update(stage=f"{name}_{tag}", steps=steps,
                   train_seconds=secs, run_dir=tr.dir)
        log_result(out)


def c6_recipe():
    from amss_tpu.configs.recipes import c6_tasnet

    return c6_tasnet()


def stage_flagship3spk_cap():
    """`flagship3spk_cap [expansion] [steps] [decay]` — 3-mix CAPACITY arm:
    the 3-speaker flagship is flat in steps (16k≈24k≈48k all ~9.1) and the
    L16 front is negative there, but capacity has never been pushed past
    exp4 on 3-mix (exp4 'giant' was the last lift, 8.91→9.12).  This arm
    widens the TCN (default expansion 6) at the r4 protocol, L32 front."""
    i = sys.argv.index("flagship3spk_cap")
    exp = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 6
    steps = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 24000
    decay = float(sys.argv[i + 3]) if len(sys.argv) > i + 3 else 0.999
    r = sized(c6_recipe(), steps, expansion=exp)
    r = dc.replace(
        r,
        model=dc.replace(r.model, nb_speakers=3),
        train=dc.replace(r.train, ema_decay=decay, device_data=True),
    )
    _train_and_eval_both(r, f"flagship3spk_exp{exp}_max_{steps // 1000}k",
                         steps)


def stage_flagship_bf16():
    """`flagship_bf16 [steps] [decay]` — stack the measured positives: the
    L16 flagship protocol with bfloat16 compute (bf16_ab2 measured bf16
    paired +0.05 dB AND 1.09x faster steady-state, so a longer horizon fits
    the same wall clock).  Candidate c6_flagship replacement if it beats
    11.49."""
    i = sys.argv.index("flagship_bf16")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 96000
    decay = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 0.999
    r = sized(c6_recipe(), steps, expansion=4, compute_dtype="bfloat16")
    r = dc.replace(
        r,
        model=dc.replace(
            r.model,
            front=dc.replace(r.model.front, filter_len=16, stride=8)),
        train=dc.replace(r.train, ema_decay=decay, device_data=True),
    )
    _train_and_eval_both(r, f"flagship_bf16_L16_max_{steps // 1000}k", steps)


def stage_stoi_l41():
    """`stoi_l41 [n]` — STOI intelligibility for the committed enrolled-L41
    checkpoint, completing the committed-checkpoint STOI table (c6_flagship /
    c6_3spk / c7_causal rows landed earlier in r4; c3_l41 was missing).
    Reproduces the c3_modern enrolled protocol exactly (train-split speakers
    at unseen offsets, Mixer step 10M+i) so the SI-SDRi column cross-checks
    the chip row (13.18).  CPU-safe: run with AMSS_WAVE_CPU=1."""
    import jax
    import jax.numpy as jnp

    from amss_tpu.data.mixer import Mixer
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.infer.evaluate import evaluate_separation
    from amss_tpu.train.engine import load_model_from_run

    i = sys.argv.index("stoi_l41")
    n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 200
    run_dir = os.path.join(REPO, "checkpoints", "c3_l41")
    model, params = load_model_from_run(run_dir)
    with open(os.path.join(run_dir, "config.json")) as f:
        tcfg = json.load(f)["train"]
    mixer = Mixer(SpeakerStore(V2BIG), nb_speakers=model.cfg.nb_speakers,
                  chunk_samples=tcfg["chunk_samples"], seed=tcfg["seed"])
    mixes, refs, sids = [], [], []
    for k in range(n):
        hb = mixer.batch("train", 10_000_000 + k, 1)
        refs.append(hb.sources[0])
        mixes.append(hb.sources[0].sum(0))
        sids.append(hb.speaker_ids[0])
    fn = jax.jit(lambda p, m, s: model.separate(p, m, speaker_ids=s))
    est = []
    for lo in range(0, n, 50):  # batch groups: CPU-friendly, batch-independent
        est.append(np.asarray(fn(
            params, jnp.asarray(np.stack(mixes[lo:lo + 50])),
            jnp.asarray(np.stack(sids[lo:lo + 50])))))
    out = evaluate_separation(np.concatenate(est), np.stack(refs),
                              np.stack(mixes), per_utt=True, with_stoi=True)
    out.update(stage=f"stoi_c3_l41_n{n}", run_dir=run_dir)
    log_result(out)


STAGES = {
    "perf_probe": stage_perf_probe,
    "serve_bisect": stage_serve_bisect,
    "flagship3": stage_flagship3,
    "flagship3b": stage_flagship3b,
    "flagship3spk": stage_flagship3spk,
    "flagship3spk_l16": stage_flagship3spk_l16,
    "dpt_flagship": stage_dpt_flagship,
    "c7refresh": stage_c7refresh,
    "count_range": stage_count_range,
    "l41_l16": stage_l41_l16,
    "bf16_ab2": stage_bf16_ab2,
    "flagship3c": stage_flagship3c,
    "dpt_default": stage_dpt_default,
    "stoi_l41": stage_stoi_l41,
    "flagship3spk_cap": stage_flagship3spk_cap,
    "flagship_bf16": stage_flagship_bf16,
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
    print("R4 WAVE DONE", flush=True)
