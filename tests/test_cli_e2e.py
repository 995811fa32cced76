"""Real-corpus dress rehearsal THROUGH THE CLI (VERDICT r2 item 9): the
day-one WSJ0/LibriSpeech path — a 16 kHz per-speaker WAV tree is ingested at
8 kHz, trained, evaluated, and separated using the actual command-line
surface (amss_tpu.cli.main), not library calls.  Mirrors SURVEY.md §1
L0 (ingest+resample) -> L5 (train) -> L6 (evaluate/separate)."""

import json
import os

import numpy as np
import pytest

from amss_tpu.cli import main
from amss_tpu.data.synthetic import synth_speaker_wave
from amss_tpu.infer.evaluate import write_wav


@pytest.fixture(scope="module")
def wav_tree(tmp_path_factory):
    """Nine 'speakers', two 16 kHz utterances each (harmonic-comb voices so
    separation is verifiable without licensed corpora, SURVEY.md §4)."""
    root = tmp_path_factory.mktemp("wavtree")
    for s in range(9):
        w = synth_speaker_wave(s, n_samples=6 * 16000, sample_rate=16000)
        half = len(w) // 2
        for u, seg in enumerate((w[:half], w[half:])):
            write_wav(str(root / f"spk{s:02d}" / f"utt{u}.wav"),
                      np.asarray(seg, np.float32), sample_rate=16000)
    return str(root)


def test_cli_dress_rehearsal(wav_tree, tmp_path, capsys):
    corpus = str(tmp_path / "store")
    workdir = str(tmp_path / "runs")

    # L0: ingest the 16 kHz tree into an 8 kHz store (windowed-sinc resample)
    main(["ingest", "--wav-root", wav_tree, "--out", corpus,
          "--sample-rate", "8000"])
    out = capsys.readouterr().out
    assert "ingested 9 speakers" in out and "8000 Hz" in out

    # L5: train a tiny c1 through the CLI
    common = ["--recipe", "c1", "--corpus", corpus,
              "--hidden", "16", "--layers", "1", "--embed-dim", "8",
              "--chunk-samples", "4096", "--batch-size", "4"]
    main(["train", *common, "--workdir", workdir,
          "--steps", "30", "--valid-every", "15"])
    out = capsys.readouterr().out
    run_dir = next(l.split("run dir: ")[1] for l in out.splitlines()
                   if l.startswith("run dir: "))
    metrics = [json.loads(l)
               for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert any("valid/loss" in m for m in metrics)

    # L6: evaluate via the CLI — emits the si_sdri/rtf JSON line
    main(["evaluate", *common, "--run-dir", run_dir, "--n-mixtures", "2"])
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"si_sdri", "sdri", "rtf"} <= set(ev)
    assert np.isfinite(ev["si_sdri"])

    # L6: separate a WAV via the CLI
    mix_wav = str(tmp_path / "mix.wav")
    a = synth_speaker_wave(101, n_samples=8000, sample_rate=8000)
    b = synth_speaker_wave(102, n_samples=8000, sample_rate=8000)
    write_wav(mix_wav, np.asarray(a + b, np.float32), sample_rate=8000)
    sep_dir = str(tmp_path / "sep")
    main(["separate", *common, "--run-dir", run_dir,
          "--wav", mix_wav, "--out", sep_dir])
    wavs = sorted(os.listdir(sep_dir))
    assert wavs == ["mix_spk0.wav", "mix_spk1.wav"]

    # L6: blind speaker-count path — auto-k estimates per mixture, groups,
    # and clusters each group at its own k (infer/count.py)
    auto_dir = str(tmp_path / "sep_auto")
    main(["separate", *common, "--run-dir", run_dir, "--wav", mix_wav,
          "--out", auto_dir, "--num-speakers", "auto", "--max-speakers", "3"])
    out = capsys.readouterr().out
    est = next(json.loads(l) for l in out.splitlines()
               if l.startswith('{"estimated_speakers"'))["estimated_speakers"]
    k_hat = est[mix_wav]
    assert 1 <= k_hat <= 3
    assert sorted(os.listdir(auto_dir)) == [
        f"mix_spk{s}.wav" for s in range(k_hat)
    ]

    # 5.1: profile train steps through the CLI (regression guard: the step
    # fn's signature grew corpus_flat in round 3 and profile wasn't updated).
    # --accum-steps/--ema-decay ride along: profile must handle the EMA
    # step's wider signature too (review r3 finding).
    main(["profile", *common, "--workdir", workdir, "--profile-steps", "2",
          "--accum-steps", "2", "--ema-decay", "0.9",
          "--trace-dir", str(tmp_path / "trace")])
    pr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pr["n"] == 2 and np.isfinite(pr["p50_s"])

    # deployment: AOT-export, then separate through the artifact — the
    # no-model-code serving path (infer/export.py)
    exp_dir = str(tmp_path / "exported")
    main(["export", *common, "--run-dir", run_dir, "--out", exp_dir,
          "--lengths", "8192", "--serve-batch", "2", "--platforms", "cpu"])
    ej = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "serving_t8192_b2.jaxexp" in ej["files"]
    sep2 = str(tmp_path / "sep_exp")
    main(["separate-exported", "--export-dir", exp_dir,
          "--wav", mix_wav, "--out", sep2])
    assert sorted(os.listdir(sep2)) == ["mix_spk0.wav", "mix_spk1.wav"]


def test_module_entry_point():
    """`python -m amss_tpu` is the package's front door (same main as
    `python -m amss_tpu.cli` / the amss-tpu script)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "amss_tpu", "--help"],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0
    assert "train" in r.stdout and "evaluate" in r.stdout


def test_grid_parse():
    from amss_tpu.cli import _parse_grid

    combos = _parse_grid(["lr=1e-3,3e-4", "expansion=2,4"])
    assert len(combos) == 4
    assert {"lr": 0.001, "expansion": 2} in combos
    assert all(isinstance(c["expansion"], int) for c in combos)
    assert _parse_grid(["trunk=tcn,dprnn"])[0]["trunk"] == "tcn"


def test_cli_sweep(wav_tree, tmp_path, capsys):
    """Two-combo sweep through the CLI: trains both, evaluates, ranks."""
    corpus = str(tmp_path / "store")
    main(["ingest", "--wav-root", wav_tree, "--out", corpus,
          "--sample-rate", "8000"])
    capsys.readouterr()
    main(["sweep", "--recipe", "c1", "--corpus", corpus,
          "--workdir", str(tmp_path / "runs"),
          "--hidden", "16", "--layers", "1", "--embed-dim", "8",
          "--chunk-samples", "4096", "--batch-size", "4",
          "--steps", "20", "--valid-every", "10",
          "--grid", "lr=1e-3,3e-3", "--n-mixtures", "2"])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    ranking = [l for l in lines if "ranking" in l]
    assert len(ranking) == 1 and len(ranking[0]["ranking"]) == 2
    lrs = sorted(r["combo"]["lr"] for r in ranking[0]["ranking"])
    assert lrs == [0.001, 0.003]
    assert all(np.isfinite(r["si_sdri"]) for r in ranking[0]["ranking"])
