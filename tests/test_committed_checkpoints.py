"""Integrity guard for the committed trained checkpoints (round-4 additions).

checkpoints/ holds params-only exports that README/PARITY make live quality
claims about (SURVEY.md §5.4 partial-restore row).  A stale or truncated
export would silently break `bench.py`, `--num-speakers auto` out of the box,
and the enrolled-L41 claim — so each new round-4 artifact must restore
through the real loader and run its advertised inference path on CPU.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    from amss_tpu.train.engine import load_model_from_run

    run_dir = os.path.join(REPO, "checkpoints", name)
    if not os.path.isdir(run_dir):
        pytest.skip(f"{name} not committed")
    return load_model_from_run(run_dir)


def test_c1_count_loads_and_counts():
    """The counting claim's artifact: a count-diverse DPCL whose eigengap
    estimate is exercised end-to-end (value not asserted — synthetic sines
    are out of distribution; accuracy is pinned by count_train_dpcl_12000_*
    rows in quality_results.jsonl)."""
    model, params = _load("c1_count")
    cfg = json.load(open(os.path.join(REPO, "checkpoints", "c1_count",
                                      "config.json")))
    assert cfg["model"]["train_min_speakers"] == 1, cfg["model"]

    from amss_tpu.infer.count import count_speakers

    t = np.arange(16384, dtype=np.float32) / 8000.0
    mix = np.stack([np.sin(2 * np.pi * 220.0 * t),
                    np.sin(2 * np.pi * 347.0 * t) * 0.5]).sum(0)
    k = count_speakers(model, params, jnp.asarray(mix[None]), k_max=4)
    k = np.asarray(k)
    assert k.shape == (1,) and k.dtype == np.int32
    assert 1 <= int(k[0]) <= 4


def test_committed_flagship_exports_aot():
    """The committed flagship must survive the AOT export path whatever its
    current arch (the round-4 L16 short-filter swap changed every front
    shape; the round-5 flagship serves in bfloat16): export one bucket on
    CPU and require artifact == live to the model's serving-dtype tolerance
    (the export recompile can fuse bf16 ops differently, so bf16 parity is
    ~1e-2 on unit-scale waveforms where f32 parity is ~1e-3)."""
    import tempfile

    import jax

    model, params = _load("c6_flagship")
    from amss_tpu.infer.export import ServingArtifact, export_serving

    out = tempfile.mkdtemp(prefix="exp_flagship_")
    export_serving(model, params, out, lengths=(16384,), batch=2,
                   platforms=("cpu",), sample_rate=8000,
                   recipe_dict={"kind": "test"})
    art = ServingArtifact(out)
    mixes = [np.random.default_rng(i).standard_normal(16384).astype(np.float32)
             * 0.3 for i in range(2)]
    ests = art.separate_all(mixes)
    fm = jnp.ones((2, model.cfg.front.frames_for(16384)), jnp.float32)
    live = np.asarray(model.separate(params, jnp.asarray(np.stack(mixes)),
                                     frame_mask=fm))
    err = max(float(np.max(np.abs(e - l))) for e, l in zip(ests, live))
    tol = 1e-3 if model.cfg.sep.compute_dtype == "float32" else 3e-2
    assert err < tol, (err, model.cfg.sep.compute_dtype)


def test_c6_3spk_loads_and_separates_three():
    """The 3-speaker flagship artifact behind the v2test3 claim: restore and
    run the TasNet separate path at its advertised source count."""
    model, params = _load("c6_3spk")
    assert model.cfg.nb_speakers == 3
    mix = np.random.default_rng(1).standard_normal(16384).astype(np.float32)
    est = np.asarray(model.separate(params, jnp.asarray(mix[None])))
    assert est.shape == (1, 3, 16384)
    assert np.isfinite(est).all()


def test_c7_causal_loads_and_separates():
    """The causal/realtime artifact (README serving claims): restore + offline
    forward; the streaming-equals-offline property itself is pinned by the
    realtime tests on random weights."""
    model, params = _load("c7_causal")
    mix = np.random.default_rng(2).standard_normal(16384).astype(np.float32)
    est = np.asarray(model.separate(params, jnp.asarray(mix[None])))
    assert est.shape == (1, 2, 16384)
    assert np.isfinite(est).all()


def test_c1_dpcl_loads_and_kmeans_separates():
    """The bench.py headline model: restore + the on-device k-means separate
    path (the exact code path bench.py times)."""
    model, params = _load("c1_dpcl")
    mix = np.random.default_rng(3).standard_normal(16384).astype(np.float32)
    est = np.asarray(model.separate(params, jnp.asarray(mix[None]),
                                    kmeans_iters=4))
    assert est.shape == (1, 2, 16384)
    assert np.isfinite(est).all()


def test_c2_adapt_loads_and_separates_via_adaptive_front():
    """The adaptive-front artifact (SURVEY §2.2): its config must carry the
    learned front (kind=adapt) and the full encode→embed→k-means→decode chain
    must run from the committed params."""
    model, params = _load("c2_adapt")
    cfg = json.load(open(os.path.join(REPO, "checkpoints", "c2_adapt",
                                      "config.json")))
    assert cfg["model"]["front"]["kind"] == "adapt", cfg["model"]["front"]
    mix = np.random.default_rng(4).standard_normal(16384).astype(np.float32)
    est = np.asarray(model.separate(params, jnp.asarray(mix[None]),
                                    kmeans_iters=4))
    assert est.shape == (1, 2, 16384)
    assert np.isfinite(est).all()


def test_c3_l41_loads_and_separates_enrolled():
    """The enrolled-L41 claim's artifact: restore + the centroid-table
    separate() path on a short mixture (speaker ids inside the trained
    table)."""
    model, params = _load("c3_l41")
    mix = np.random.default_rng(0).standard_normal(16384).astype(np.float32)
    est = model.separate(params, jnp.asarray(mix[None]),
                         speaker_ids=jnp.asarray([[0, 1]]))
    est = np.asarray(est)
    assert est.shape == (1, 2, 16384)
    assert np.isfinite(est).all()
