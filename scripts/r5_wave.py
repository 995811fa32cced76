"""Round-5 experiment driver (VERDICT.md r4 items 2, 4, 5).

Stages:
  headline_bisect — item 4: split the headline c1 BLSTM-DPCL serving call's
                    625 ms device time (BENCH_r04) into encoder / BLSTM trunk /
                    k-means / decode, pipelined-dispatch timing (one fetch at
                    the end — a per-call fetch books the tunnel's ~1.2 s
                    completion-poll as device time).  Then measure the levers:
                    scan unroll, bf16 scan compute, fewer Lloyd iterations,
                    batch 64; quality-check any lever that wins.
  rt_variance     — item 5: sync vs pipelined realtime push across interleaved
                    repetitions with the RTT band recorded, so the
                    pipelined-vs-sync question gets a variance-aware answer
                    instead of two single draws (BENCH_r03 said pipelined wins,
                    BENCH_r04 said it loses — both inside tunnel variance?).
  mix3_decomp     — item 2a: per-utterance error decomposition of the
                    committed 3-speaker flagship vs the STFT-IBM oracle on the
                    same 200 v2test 3-mix mixtures (and the 2-mix flagship as
                    contrast): per-source SI-SDR at the PIT assignment,
                    permutation margin, source-energy correlation, BSS-Eval
                    SIR/SAR split — is the 13.7-oracle gap pair-confusion,
                    attenuation, or artifacts?

Shared helpers (corpora, test-mixture convention, log_result) come from
r3_wave.  Results append to quality_results.jsonl (committed).
"""

import dataclasses as dc
import itertools
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
    ensure_corpora,
    log_result,
    test_mixtures,
)


def _dev_ms(fn, args, reps=6):
    """Per-call device time of jit(fn)(*args): inputs resident, `reps` calls
    dispatched back-to-back, ONE 4-float fetch (bench.py convention)."""
    import jax

    g = jax.jit(lambda *a: fn(*a).ravel()[:4] * 1.0)
    np.asarray(g(*args))  # compile + first sync
    t0 = time.perf_counter()
    for _ in range(reps):
        r = g(*args)
    np.asarray(r)
    return round(1000.0 * (time.perf_counter() - t0) / reps, 2)


def _load(ckpt):
    from amss_tpu.train.engine import load_model_from_run

    return load_model_from_run(os.path.join(REPO, "checkpoints", ckpt))


def stage_headline_bisect():
    """`headline_bisect` — where do the headline's 625 device-ms/call go?"""
    import jax
    import jax.numpy as jnp

    from amss_tpu.models.front import vad_weights
    from amss_tpu.ops.kmeans import kmeans

    model, params = _load("c1_dpcl")
    c = model.cfg
    t, b = 64000, 8
    nf = c.front.frames_for(t)
    rng = np.random.default_rng(0)
    mix = jax.device_put(rng.standard_normal((b, t)).astype(np.float32) * 0.3)
    fm = jax.device_put(np.ones((b, nf), np.float32))
    p = jax.device_put(params)
    out = {"stage": "headline_bisect_r5", "batch": b, "seconds": t / 8000}

    def enc(p, m, fmk):
        codes, _ = model.front.encode(p["front"], m)
        return model.front.features(p["front"], codes)

    def emb(p, m, fmk):
        return model.embed(p, enc(p, m, fmk), fmk)

    def clu(p, m, fmk):
        codes, _ = model.front.encode(p["front"], m)
        feats = model.front.features(p["front"], codes)
        v = model.embed(p, feats, fmk)
        w = vad_weights(codes, c.vad_threshold_db) * fmk[..., None]
        cent, _ = kmeans(v.reshape(b, -1, c.sep.embed_dim), k=2, iters=10,
                         weights=w.reshape(b, -1))
        return cent

    full = lambda p, m, fmk: model.separate(p, m, frame_mask=fmk)  # noqa: E731
    # cumulative pipelined timings; successive diffs = per-stage device cost
    out["ms_encode"] = _dev_ms(enc, (p, mix, fm))
    out["ms_thru_embed"] = _dev_ms(emb, (p, mix, fm))
    out["ms_thru_kmeans"] = _dev_ms(clu, (p, mix, fm))
    out["ms_full"] = _dev_ms(full, (p, mix, fm))

    # levers on the full call (all serve the SAME committed params)
    out["ms_full_iters4"] = _dev_ms(
        lambda p, m, fmk: model.separate(p, m, kmeans_iters=4, frame_mask=fmk),
        (p, mix, fm))
    variants = {}
    for tag, sep_over in (
        ("unroll4", dict(scan_unroll=4)),
        ("unroll8", dict(scan_unroll=8)),
        ("unroll16", dict(scan_unroll=16)),
        ("bf16", dict(compute_dtype="bfloat16")),
        ("bf16_unroll8", dict(compute_dtype="bfloat16", scan_unroll=8)),
    ):
        m2 = type(model)(dc.replace(c, sep=dc.replace(c.sep, **sep_over)))
        variants[tag] = m2
        out[f"ms_full_{tag}"] = _dev_ms(
            lambda p, m, fmk, m2=m2: m2.separate(p, m, frame_mask=fmk),
            (p, mix, fm))
    # batch 64: latency-bound stages amortize; the b8 headline is a protocol
    # choice, so record what the throughput shape buys
    mix64 = jax.device_put(
        rng.standard_normal((64, t)).astype(np.float32) * 0.3)
    fm64 = jax.device_put(np.ones((64, nf), np.float32))
    out["ms_full_b64"] = _dev_ms(full, (p, mix64, fm64), reps=3)
    log_result(dict(out))

    # quality guard for the winning levers: paired per-utt delta vs base on
    # the v2test protocol (n=64 is plenty for a should-be-~0 delta)
    mixes, refs = test_mixtures(V2, 2, 64)
    mix_t = jnp.asarray(np.stack(mixes))
    fm_t = jnp.ones((64, c.front.frames_for(mixes[0].shape[-1])), jnp.float32)

    def per_utt(m2):
        from amss_tpu.ops.metrics import pit_si_sdr, si_sdr

        est = jax.jit(lambda p, m, fmk: m2.separate(p, m, frame_mask=fmk))(
            params, mix_t, fm_t)
        sep_scores, _ = pit_si_sdr(est, jnp.asarray(np.stack(refs)))
        base = jnp.mean(si_sdr(
            jnp.broadcast_to(mix_t[:, None, :], np.stack(refs).shape),
            jnp.asarray(np.stack(refs))), axis=-1)
        return np.asarray(sep_scores - base)

    base_utt = per_utt(model)
    qrow = {"stage": "headline_bisect_r5_quality", "n": 64,
            "si_sdri_base": round(float(base_utt.mean()), 3)}
    for tag in ("unroll8", "bf16", "bf16_unroll8"):
        d = per_utt(variants[tag]) - base_utt
        qrow[f"delta_{tag}"] = round(float(d.mean()), 4)
        qrow[f"delta_{tag}_absmax"] = round(float(np.abs(d).max()), 4)
    log_result(qrow)


def stage_rt_variance():
    """`rt_variance [reps]` — sync vs pipelined realtime RTF, interleaved."""
    import jax
    import jax.numpy as jnp

    from amss_tpu.infer.realtime import RealtimeSeparator

    i = sys.argv.index("rt_variance")
    reps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 5
    model, params = _load("c7_causal")
    rt = RealtimeSeparator(model, params, chunk_samples=8192)
    rng = np.random.default_rng(0)
    chunks = [rng.standard_normal(8192).astype(np.float32) * 0.3
              for _ in range(12)]

    tiny = jax.jit(lambda x: x + 1.0)
    x8 = jnp.zeros((8,), jnp.float32)

    def rtt_ms():
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(tiny(x8))
            ts.append(1e3 * (time.perf_counter() - t0))
        return ts

    def one(pipelined):
        rt.reset()
        c0, n0 = rt.compute_seconds, rt._timed_pushes
        if pipelined:
            for ch in chunks:
                rt.push_async(ch)
            rt.flush()
        else:
            for ch in chunks:
                rt.push(ch)
        audio = (rt._timed_pushes - n0) * 8192 / 8000
        return (rt.compute_seconds - c0) / audio

    # warm both paths (compile + first-fetch sync) before any timed rep
    one(False), one(True)
    rtts = rtt_ms()
    sync, pipe = [], []
    for _ in range(reps):  # interleave so tunnel drift hits both arms alike
        sync.append(one(False))
        pipe.append(one(True))
    rtts += rtt_ms()
    band = lambda v: [round(float(np.min(v)), 5), round(float(np.median(v)), 5),  # noqa: E731
                      round(float(np.max(v)), 5)]
    log_result({
        "stage": "rt_variance_r5", "reps": reps, "pushes_per_rep": 12,
        "rtf_sync_band": band(sync), "rtf_pipelined_band": band(pipe),
        "rtf_sync_all": [round(v, 5) for v in sync],
        "rtf_pipelined_all": [round(v, 5) for v in pipe],
        "rtt_ms_band": band(rtts),
        "paired_pipelined_minus_sync": round(
            float(np.median(np.array(pipe) - np.array(sync))), 5),
    })


def _per_source_decomp(est, refs, mixes):
    """Host-side decomposition given est/refs [N, S, T], mixes [N, T]:
    per-source SI-SDRi at the PIT assignment, permutation margin, energy
    shares, BSS-Eval SDR/SIR/SAR per source."""
    import jax.numpy as jnp

    from amss_tpu.ops.bss_eval import bss_eval_sources
    from amss_tpu.ops.metrics import si_sdr

    n, s, _ = refs.shape
    est_j, ref_j = jnp.asarray(est), jnp.asarray(refs)
    perms = list(itertools.permutations(range(s)))
    scores = jnp.stack(
        [jnp.mean(si_sdr(est_j[:, list(pm), :], ref_j), axis=-1)
         for pm in perms], axis=-1)  # [N, n_perms]
    order = np.sort(np.asarray(scores), axis=-1)
    margin = order[:, -1] - order[:, -2]  # best vs runner-up mean SI-SDR
    best = np.asarray(jnp.argmax(scores, axis=-1))
    aligned = np.stack([est[i, list(perms[best[i]]), :] for i in range(n)])
    src_si = np.asarray(si_sdr(jnp.asarray(aligned), ref_j))  # [N, S]
    base_si = np.asarray(si_sdr(
        jnp.broadcast_to(jnp.asarray(mixes)[:, None, :], refs.shape), ref_j))
    src_sisdri = src_si - base_si
    energy = (refs ** 2).sum(-1)
    share = energy / energy.sum(-1, keepdims=True)
    sdr = np.zeros((n, s))
    sir = np.zeros((n, s))
    sar = np.zeros((n, s))
    for i in range(n):
        sdr[i], sir[i], sar[i], _ = bss_eval_sources(refs[i], aligned[i])
    return dict(src_sisdri=src_sisdri, margin=margin, share=share,
                sdr=sdr, sir=sir, sar=sar)


def _decomp_row(tag, d, oracle_sisdri_utt=None):
    q = lambda v, p: round(float(np.percentile(v, p)), 3)  # noqa: E731
    flat = d["src_sisdri"].ravel()
    utt = d["src_sisdri"].mean(-1)
    row = {
        "stage": tag,
        "n": int(d["src_sisdri"].shape[0]),
        "si_sdri": round(float(utt.mean()), 3),
        "src_sisdri_p10_p25_p50_p90": [q(flat, 10), q(flat, 25),
                                       q(flat, 50), q(flat, 90)],
        "frac_src_below_0db": round(float((flat < 0).mean()), 4),
        "frac_src_below_3db": round(float((flat < 3).mean()), 4),
        "frac_src_below_5db": round(float((flat < 5).mean()), 4),
        "perm_margin_p10_p50": [q(d["margin"], 10), q(d["margin"], 50)],
        "frac_margin_below_1db": round(float((d["margin"] < 1).mean()), 4),
        "sir_mean": round(float(d["sir"].mean()), 3),
        "sar_mean": round(float(d["sar"].mean()), 3),
        "sir_p10": q(d["sir"].ravel(), 10),
        "sar_p10": q(d["sar"].ravel(), 10),
        # energy-share correlation: negative = quiet sources fail
        "corr_share_sisdri": round(float(np.corrcoef(
            d["share"].ravel(), d["src_sisdri"].ravel())[0, 1]), 4),
        "quietest_src_sisdri": round(float(
            d["src_sisdri"][np.arange(len(utt)),
                            d["share"].argmin(-1)].mean()), 3),
        "loudest_src_sisdri": round(float(
            d["src_sisdri"][np.arange(len(utt)),
                            d["share"].argmax(-1)].mean()), 3),
    }
    if oracle_sisdri_utt is not None:
        gap = oracle_sisdri_utt - utt
        row["oracle_si_sdri"] = round(float(oracle_sisdri_utt.mean()), 3)
        row["gap_p10_p50_p90"] = [q(gap, 10), q(gap, 50), q(gap, 90)]
        # uniform gap -> capacity/objective; heavy tail -> confusions
        row["corr_gap_vs_oracle"] = round(float(
            np.corrcoef(oracle_sisdri_utt, gap)[0, 1]), 4)
        row["frac_gap_above_6db"] = round(float((gap > 6).mean()), 4)
    return row


def _oracle_per_utt(mixes, refs, win=256, hop=64):
    import jax.numpy as jnp

    from amss_tpu.ops.metrics import si_sdr
    from amss_tpu.ops.stft import istft_ri, stft_ri

    utt = []
    ests = []
    for mix, src in zip(mixes, refs):
        re_s, im_s = stft_ri(jnp.asarray(src), win, hop)
        mag = jnp.sqrt(re_s ** 2 + im_s ** 2)
        ibm = (mag >= jnp.max(mag, axis=0, keepdims=True)).astype(jnp.float32)
        re_m, im_m = stft_ri(jnp.asarray(mix), win, hop)
        est = istft_ri(ibm * re_m[None], ibm * im_m[None], win, hop,
                       length=src.shape[-1])
        base = si_sdr(jnp.asarray(mix)[None], jnp.asarray(src))
        utt.append(float(jnp.mean(si_sdr(est, jnp.asarray(src)) - base)))
        ests.append(np.asarray(est))
    return np.array(utt), np.stack(ests)


def stage_mix3_decomp():
    """`mix3_decomp [n]` — decompose the 3-mix error (VERDICT r4 item 2a)."""
    import jax
    import jax.numpy as jnp

    i = sys.argv.index("mix3_decomp")
    n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 200

    for ckpt, s, tag in (("c6_3spk", 3, "mix3_decomp_3spk"),
                         ("c6_flagship", 2, "mix3_decomp_2spk")):
        model, params = _load(ckpt)
        mixes, refs = test_mixtures(V2, s, n)
        fn = jax.jit(lambda p, m: model.separate(p, m))
        groups = []
        for lo in range(0, n, 25):  # dispatch all groups, then fetch
            groups.append(fn(params, jnp.asarray(np.stack(mixes[lo:lo + 25]))))
        est = np.concatenate([np.asarray(g) for g in groups])
        refs_a, mixes_a = np.stack(refs), np.stack(mixes)
        oracle_utt, _ = _oracle_per_utt(mixes, refs)
        d = _per_source_decomp(est, refs_a, mixes_a)
        row = _decomp_row(tag, d, oracle_sisdri_utt=oracle_utt)
        row["ckpt"] = ckpt
        log_result(row)


def stage_mix3_warmstart():
    """`mix3_warmstart [steps] [lr] [decay]` — 3-mix curriculum from the
    2-mix champion (VERDICT r4 item 2c, the hypothesis-driven lever): init
    the 3-speaker TasNet's front + trunk from a trained 2-mix checkpoint —
    the mask head is S-dependent (feature_dim x nb_speakers) and stays
    fresh — then train at the r4 protocol with a reduced peak lr so the
    transferred weights aren't wiped by warmup.

    Donor: the r3 L32 flagship2b-lineage champion (96k-step EMA arm, 11.04),
    extracted from git history — the L16 front measured NEGATIVE on 3-mix
    from scratch (`flagship3spk_L16_max_48k_*`), so the L32 champion is the
    arch-matched donor for the committed L32 3-mix baseline."""
    import subprocess

    import jax
    import jax.numpy as jnp

    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer, load_model_from_run
    from r3_wave import V2MAX, blind_eval, sized

    i = sys.argv.index("mix3_warmstart")
    steps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 24000
    lr = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 3e-4
    decay = float(sys.argv[i + 3]) if len(sys.argv) > i + 3 else 0.999

    donor_dir = "/tmp/l32_flagship_donor"
    os.makedirs(donor_dir, exist_ok=True)
    for fname in ("config.json", "ckpt_best.msgpack", "ckpt_best.msgpack.json",
                  "EXPORT.json"):
        r = subprocess.run(
            ["git", "-C", REPO, "show",
             f"4ff04f2:checkpoints/c6_flagship/{fname}"],
            capture_output=True)
        if r.returncode == 0:
            with open(os.path.join(donor_dir, fname), "wb") as f:
                f.write(r.stdout)
    donor_model, donor_params = load_model_from_run(donor_dir)
    assert donor_model.cfg.front.filter_len == 32  # the L32 arch donor

    from amss_tpu.configs.recipes import c6_tasnet

    r = sized(c6_tasnet(), steps, expansion=4)
    r = dc.replace(
        r,
        model=dc.replace(r.model, nb_speakers=3),
        train=dc.replace(r.train, ema_decay=decay, device_data=True, lr=lr),
    )
    tr = Trainer(r, SpeakerStore(V2MAX), workdir="runs_r5")
    state = tr.init_state()
    p = dict(state["params"])
    p["front"] = donor_params["front"]
    sep = dict(p["separator"])
    for k, v in donor_params["separator"].items():
        if k != "proj_mask":  # S-dependent head stays freshly initialized
            sep[k] = v
    p["separator"] = sep
    state["params"] = p
    if "ema_params" in state:
        state["ema_params"] = jax.tree_util.tree_map(jnp.array, p)
    t0 = time.time()
    out_state = tr.fit(state)
    secs = round(time.time() - t0, 1)
    for tag, pp in (("raw", out_state["params"]),
                    ("ema", out_state.get("ema_params"))):
        if pp is None:
            continue
        out = blind_eval(tr.model, pp, V2, n=200)
        out.update(stage=f"mix3_warmstart_{steps // 1000}k_lr{lr}_{tag}",
                   steps=steps, train_seconds=secs, run_dir=tr.dir)
        log_result(out)


STAGES = {
    "headline_bisect": stage_headline_bisect,
    "rt_variance": stage_rt_variance,
    "mix3_decomp": stage_mix3_decomp,
    "mix3_warmstart": stage_mix3_warmstart,
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
    print("R5 WAVE DONE", flush=True)
