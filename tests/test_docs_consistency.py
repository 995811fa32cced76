"""Docs-vs-driver consistency guard (VERDICT r3 item 6).

Rounds 2 and 3 both burned their top verdict slot on README/PARITY headline
numbers contradicting the driver-captured BENCH_r*.json.  This test pins the
convention: README.md and PARITY.md each carry exactly one line of the form

    Driver-captured headline (BENCH_rNN.json): rtf <value>

and that line must name the NEWEST committed BENCH_r*.json and quote its
``value`` field verbatim.  When the driver records a new BENCH file at the
end of a round, this test fails until the docs are updated — a loud diff
instead of a silent drift.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LINE = re.compile(
    r"[Dd]river-captured headline \((BENCH_r\d+\.json)\):\s*rtf\s*([0-9.]+)"
)


def _newest_bench():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert paths, "no BENCH_r*.json committed"
    rec = json.load(open(paths[-1]))
    parsed = rec.get("parsed") or rec
    return os.path.basename(paths[-1]), parsed.get("value")


def test_docs_quote_newest_driver_bench():
    name, value = _newest_bench()
    if value is None:
        return  # driver recorded an error run; nothing to pin against
    for doc in ("README.md", "PARITY.md"):
        text = open(os.path.join(REPO, doc)).read()
        m = _LINE.search(text)
        assert m, (
            f"{doc} is missing the 'Driver-captured headline "
            f"(BENCH_rNN.json): rtf <value>' line"
        )
        assert m.group(1) == name, (
            f"{doc} quotes {m.group(1)} but the newest driver capture is "
            f"{name} — update the headline line"
        )
        assert abs(float(m.group(2)) - value) < 1e-9, (
            f"{doc} quotes rtf {m.group(2)} but {name} records {value}"
        )
