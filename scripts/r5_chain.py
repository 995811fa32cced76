"""Round-5 flagship-horizon chain (VERDICT.md r4 item 3) with auto-resume.

Runs the two queued 96k arms sequentially on the real chip:

  flagship_bf16_96k — the L16 flagship protocol with bfloat16 compute
                      (bf16_ab2 measured bf16 paired +0.05 dB and 1.09x
                      faster); candidate c6_flagship replacement if its
                      n=200 CI clears the committed 11.49.
  flagship3b_96k    — the f32 L16 horizon arm (11.49 at 48k "had not
                      plateaued", NOTES_r4).

Unlike the plain wave stages, each arm here survives tunnel outages: fit()
runs inside a retry loop that restores ckpt_latest and continues (the
stateless (seed, step) Mixer makes the continuation bit-exact with an
uninterrupted run — same property stage_resume relies on).  /tmp is wiped
on container restarts, so workdirs live in the repo under runs_r5/
(gitignored) and the chain can be relaunched idempotently: finished arms
are skipped via a sentinel row check in quality_results.jsonl.

Recipes mirror scripts/r4_wave.py stage_flagship_bf16 / stage_flagship3b
exactly (same corpus, EMA decay, eval protocol) so rows are comparable.
"""

import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3_wave import (  # noqa: E402
    RESULTS,
    V2,
    V2MAX,
    blind_eval,
    ensure_corpora,
    log_result,
    sized,
)
from r4_wave import c6_recipe  # noqa: E402

WORKDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs_r5")


def _arm(steps: int, dtype: str, decay: float = 0.999):
    over = {"expansion": 4}
    if dtype == "bf16":
        over["compute_dtype"] = "bfloat16"
    r = sized(c6_recipe(), steps, **over)
    return dc.replace(
        r,
        model=dc.replace(
            r.model,
            front=dc.replace(r.model.front, filter_len=16, stride=8)),
        # steps_per_call=20: hash-excluded execution knob (bit-exact with 1,
        # tested) — 20x fewer tunnel calls, because tonight's tunnel hangs a
        # call roughly hourly and each hang costs a watchdog window
        train=dc.replace(r.train, ema_decay=decay, device_data=True,
                         steps_per_call=20),
    )


def _done(name: str) -> bool:
    if not os.path.exists(RESULTS):
        return False
    with open(RESULTS) as f:
        for line in f:
            try:
                if json.loads(line).get("stage") == f"{name}_ema":
                    return True
            except json.JSONDecodeError:
                continue
    return False


def run_arm(name: str, recipe, steps: int, retries: int = 60):
    from amss_tpu.data.store import SpeakerStore
    from amss_tpu.train.engine import Trainer

    if _done(name):
        print(f"[{name}] already has an _ema row — skipping", flush=True)
        return
    t0 = time.time()
    state = None
    for attempt in range(retries):
        tr = Trainer(recipe, SpeakerStore(V2MAX), workdir=WORKDIR)
        if os.path.exists(os.path.join(tr.dir, "ckpt_latest.msgpack")):
            state = tr.restore()
            print(f"[{name}] attempt {attempt}: resume from step "
                  f"{state['step']}", flush=True)
            if state["step"] >= steps:
                break
        else:
            state = None
            print(f"[{name}] attempt {attempt}: fresh start", flush=True)
        try:
            state = tr.fit(state)
            break
        except Exception as e:  # tunnel stall / outage — restore and go again
            print(f"[{name}] attempt {attempt} died: {e!r}", flush=True)
            time.sleep(90)
    else:
        raise SystemExit(f"[{name}] retries exhausted")
    secs = round(time.time() - t0, 1)
    # The n=200 evals are silent for 10-20 min; beat a file so the 15-min
    # watchdog staleness window doesn't false-kill mid-eval.  (A device hang
    # during eval would keep beating — acceptable: evals are re-runnable and
    # the session polls manually.)
    import threading

    stop = threading.Event()

    def _beat():
        while not stop.is_set():
            with open(os.path.join(WORKDIR, "eval_heartbeat"), "w") as f:
                f.write(str(time.time()))
            stop.wait(120)

    threading.Thread(target=_beat, daemon=True).start()
    try:
        for tag, p in (("raw", state["params"]),
                       ("ema", state.get("ema_params"))):
            if p is None:
                continue
            out = blind_eval(tr.model, p, V2, n=200)
            out.update(stage=f"{name}_{tag}", steps=steps,
                       train_seconds=secs, run_dir=tr.dir)
            log_result(out)
    finally:
        stop.set()


if __name__ == "__main__":
    ensure_corpora()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 96000
    run_arm(f"flagship_bf16_L16_max_{steps // 1000}k",
            _arm(steps, "bf16"), steps)
    run_arm(f"flagship3b_L16_max_{steps // 1000}k",
            _arm(steps, "f32"), steps)
    print("R5 CHAIN DONE", flush=True)
