"""Paired bootstrap delta tool (scripts/paired_delta.py).

The wave-script evals are draw-deterministic (r3_wave.test_mixtures: Mixer
seed 0, test split, steps 0..n-1), so same-corpus same-n rows are paired;
this tool turns two logged rows into a delta CI.  Tests exercise the core
statistic and the row-selection plumbing on a synthetic results file.
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")

from paired_delta import newest_row, paired_delta_ci


def test_constant_shift_recovered_exactly():
    rng = np.random.default_rng(0)
    base = rng.normal(8.0, 3.0, size=200)  # big across-utterance variance
    out = paired_delta_ci(base + 0.5, base)
    assert out["mean_delta"] == pytest.approx(0.5, abs=1e-12)
    # paired CI collapses to a point when the delta is constant
    assert out["ci_hi"] - out["ci_lo"] < 1e-9
    assert out["stderr"] < 1e-12
    assert out["frac_a_wins"] == 1.0


def test_null_delta_ci_contains_zero_and_is_tight():
    rng = np.random.default_rng(1)
    base = rng.normal(8.0, 3.0, size=200)
    noise = rng.normal(0.0, 0.2, size=200)  # small paired noise
    out = paired_delta_ci(base + noise, base)
    assert out["ci_lo"] < out["mean_delta"] < out["ci_hi"]
    assert out["ci_lo"] < 0.1 and out["ci_hi"] > -0.1
    # the paired CI width reflects the 0.2-dB noise, not the 3-dB
    # across-utterance spread the marginal CIs carry
    assert out["ci_hi"] - out["ci_lo"] < 0.2


def test_rejects_mismatched_lengths():
    with pytest.raises(ValueError):
        paired_delta_ci(np.zeros(10), np.zeros(11))


def test_newest_row_picks_latest_and_missing_raises():
    rows = [
        {"stage": "a", "time": 1.0, "v": 1},
        {"stage": "a", "time": 3.0, "v": 2},
        {"stage": "b", "time": 2.0, "v": 3},
    ]
    assert newest_row(rows, "a")["v"] == 2
    with pytest.raises(SystemExit):
        newest_row(rows, "nope")


def test_cli_end_to_end(tmp_path, monkeypatch):
    import paired_delta as pd

    results = tmp_path / "quality_results.jsonl"
    rng = np.random.default_rng(2)
    base = rng.normal(9.0, 2.5, size=64)
    rows = [
        {"stage": "armA", "time": 10.0,
         "si_sdri_per_utt": list(np.round(base + 0.3, 6))},
        {"stage": "armB", "time": 11.0,
         "si_sdri_per_utt": list(np.round(base, 6))},
    ]
    with open(results, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    monkeypatch.setattr(pd, "RESULTS", str(results))

    out = pd.main(["armA", "armB", "--log", "delta_test"])
    assert out["mean_delta"] == pytest.approx(0.3, abs=1e-4)
    logged = [json.loads(l) for l in open(results)]
    assert logged[-1]["stage"] == "delta_test"
    assert logged[-1]["mean_delta"] == out["mean_delta"]
