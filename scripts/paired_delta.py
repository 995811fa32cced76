"""Paired bootstrap comparison between two logged quality rows.

Every quality row produced by the wave scripts evaluates the SAME
deterministic test mixtures (`r3_wave.test_mixtures`: Mixer seed 0, test
split, steps 0..n-1), so two rows with equal n on the same corpus /
nb_speakers are PAIRED samples.  Differencing per utterance removes the
shared mixture-difficulty variance, which dominates the marginal CIs —
a paired CI resolves deltas the two overlapping marginal CIs cannot
(capability parity with the reference's significance reporting,
SURVEY.md §2.6; the marginal `bootstrap_ci` lives in
amss_tpu/infer/evaluate.py).

Usage:
  python scripts/paired_delta.py STAGE_A STAGE_B \
      [--metric si_sdri] [--n-boot 10000] [--log NAME]

Picks the NEWEST row carrying each stage name.  The reported delta is
A - B.  `--log NAME` appends a summary row (stage=NAME) to
quality_results.jsonl so dispositions cite a committed artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "quality_results.jsonl")


def paired_delta_ci(
    a: np.ndarray,
    b: np.ndarray,
    n_boot: int = 10000,
    seed: int = 0,
    level: float = 95.0,
) -> dict:
    """Bootstrap CI of mean(a - b) resampling utterance INDICES (keeping
    pairs together).  Also reports the fraction of utterances where a > b."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape or a.ndim != 1:
        raise ValueError(f"paired arrays must be same-length 1-D, got "
                         f"{a.shape} vs {b.shape}")
    d = a - b
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(d), size=(n_boot, len(d)))
    means = d[idx].mean(axis=1)
    lo, hi = np.percentile(means, [(100 - level) / 2, 100 - (100 - level) / 2])
    return {
        "mean_delta": float(d.mean()),
        "ci_lo": float(lo),
        "ci_hi": float(hi),
        "stderr": float(d.std(ddof=1) / np.sqrt(len(d))),
        "n": int(len(d)),
        "frac_a_wins": float((d > 0).mean()),
    }


def newest_row(rows: list[dict], stage: str) -> dict:
    match = [r for r in rows if r.get("stage") == stage]
    if not match:
        raise SystemExit(f"no row with stage={stage!r} in {RESULTS}")
    return max(match, key=lambda r: r.get("time", 0.0))


def main(argv: list[str]) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("stage_a")
    ap.add_argument("stage_b")
    ap.add_argument("--metric", default="si_sdri",
                    help="row key; per-utt array read from <metric>_per_utt")
    ap.add_argument("--n-boot", type=int, default=10000)
    ap.add_argument("--log", default=None,
                    help="append a summary row with this stage name")
    args = ap.parse_args(argv)

    with open(RESULTS) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    ra, rb = newest_row(rows, args.stage_a), newest_row(rows, args.stage_b)
    key = f"{args.metric}_per_utt"
    for name, r in ((args.stage_a, ra), (args.stage_b, rb)):
        if key not in r:
            raise SystemExit(f"row {name!r} has no {key} (re-run the eval "
                             f"with per_utt=True)")
    out = paired_delta_ci(np.array(ra[key]), np.array(rb[key]),
                          n_boot=args.n_boot)
    out.update(metric=args.metric, stage_a=args.stage_a, stage_b=args.stage_b)
    print(json.dumps(out, indent=2))
    if args.log:
        import time as _time
        row = dict(out, stage=args.log, time=_time.time())
        with open(RESULTS, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"logged as stage={args.log}")
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
