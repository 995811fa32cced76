"""Docs-vs-driver consistency guard (VERDICT r3 item 6, widened r5 per
VERDICT r4 Weak #2).

Rounds 2-4 each burned a verdict slot on README/PARITY perf numbers
contradicting the driver-captured BENCH_r*.json.  This test pins the
convention: README.md and PARITY.md each carry exactly one line of the form

    Driver-captured headline (BENCH_rNN.json): rtf <value>

plus one details line of the form

    Driver capture details (BENCH_rNN.json): train_step_ms_b16 <v>,
    train_mfu_vs_v5e_peak <v>, longform_rtf <v>, realtime_rtf_1s_chunks <v>

Two modes:
  * The named capture must exist and every quoted value must match it
    VERBATIM — a doc can never misquote the capture it cites (this is what
    let the round-4 train-step arch confound sail through: only the headline
    rtf was pinned).
  * If a NEWER BENCH_r*.json has been committed since the docs were written
    (the driver records one at the end of every round, after the builder's
    last commit), the quoted values must additionally sit within a tolerance
    band of the newer capture — tunnel-day variance passes silently, a
    material perf change fails loudly until the docs are reconciled.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_HEAD = re.compile(
    r"[Dd]river-captured headline \((BENCH_r\d+\.json)\):\s*rtf\s*([0-9.]+)"
)
_DETAIL = re.compile(
    r"[Dd]river capture details \((BENCH_r\d+\.json)\):\s*(.*?)(?:\n\s*\n|\Z)",
    re.S,
)
# metric -> relative tolerance vs a NEWER driver capture.  rtf-class numbers
# ride the tunnel (RTT band 24-40 ms observed across rounds); the train step
# is donated/pipelined and varies less.
_PINNED = {
    "train_step_ms_b16": 0.25,
    "train_mfu_vs_v5e_peak": 0.30,
    "longform_rtf": 0.40,
    "realtime_rtf_1s_chunks": 0.40,
}
_HEADLINE_TOL = 0.40


def _bench(path):
    rec = json.load(open(path))
    return rec.get("parsed") or rec


def _benches():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert paths, "no BENCH_r*.json committed"
    return paths


def _doc_quotes(doc):
    text = open(os.path.join(REPO, doc)).read()
    m = _HEAD.search(text)
    assert m, (
        f"{doc} is missing the 'Driver-captured headline "
        f"(BENCH_rNN.json): rtf <value>' line"
    )
    d = _DETAIL.search(text)
    assert d, (
        f"{doc} is missing the 'Driver capture details (BENCH_rNN.json): "
        f"metric value, ...' line"
    )
    assert d.group(1) == m.group(1), (
        f"{doc} headline cites {m.group(1)} but details cite {d.group(1)}"
    )
    vals = {}
    for part in d.group(2).split(","):
        kv = part.split()
        if len(kv) >= 2:
            try:
                vals[kv[0]] = float(kv[1].rstrip(".;"))
            except ValueError:
                pass
    missing = sorted(set(_PINNED) - set(vals))
    assert not missing, f"{doc} details line is missing metrics: {missing}"
    return m.group(1), float(m.group(2)), vals


def test_docs_quote_a_real_driver_bench_verbatim():
    for doc in ("README.md", "PARITY.md"):
        name, rtf, vals = _doc_quotes(doc)
        path = os.path.join(REPO, name)
        assert os.path.exists(path), f"{doc} cites {name}, which is not committed"
        parsed = _bench(path)
        if parsed.get("value") is None:
            continue  # cited capture was an error run; nothing to pin
        assert abs(rtf - parsed["value"]) < 1e-9, (
            f"{doc} quotes rtf {rtf} but {name} records {parsed['value']}"
        )
        for k in _PINNED:
            assert k in parsed, f"{name} lacks {k} (doc quotes it)"
            assert abs(vals[k] - parsed[k]) < 1e-9, (
                f"{doc} quotes {k}={vals[k]} but {name} records {parsed[k]}"
            )


def test_docs_within_tolerance_of_newest_driver_bench():
    paths = _benches()
    newest = _bench(paths[-1])
    if newest.get("value") is None:
        return  # driver recorded an error run; nothing to compare against
    for doc in ("README.md", "PARITY.md"):
        name, rtf, vals = _doc_quotes(doc)
        if name == os.path.basename(paths[-1]):
            continue  # verbatim test already covers the exact-match case
        rel = abs(rtf - newest["value"]) / newest["value"]
        assert rel <= _HEADLINE_TOL, (
            f"{doc} cites {name} rtf {rtf}, but the newest capture "
            f"{paths[-1]} records {newest['value']} ({rel:.0%} off > "
            f"{_HEADLINE_TOL:.0%}) — reconcile the docs"
        )
        for k, tol in _PINNED.items():
            if k not in newest or not newest[k]:
                continue
            rel = abs(vals[k] - newest[k]) / abs(newest[k])
            assert rel <= tol, (
                f"{doc} quotes {k}={vals[k]} but the newest capture "
                f"{paths[-1]} records {newest[k]} ({rel:.0%} off > {tol:.0%})"
                f" — reconcile the docs"
            )
