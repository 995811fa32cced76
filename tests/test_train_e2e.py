"""End-to-end slice (SURVEY.md §7 step 3): data -> front -> BLSTM -> DPCL loss
-> Adam on tiny shapes; loss decreases; checkpoint/resume is exact."""

import dataclasses

import jax

import numpy as np

from amss_tpu.configs.recipes import c1_stft_dpcl
from amss_tpu.data.synthetic import make_synthetic_corpus
from amss_tpu.train.engine import Trainer


def _tiny(steps=12):
    r = c1_stft_dpcl()
    return dataclasses.replace(
        r,
        train=dataclasses.replace(
            r.train,
            batch_size=2,
            chunk_samples=2048,
            steps=steps,
            valid_every=6,
            valid_steps=1,
            lr=3e-3,
        ),
        model=dataclasses.replace(
            r.model,
            sep=dataclasses.replace(r.model.sep, hidden=24, layers=1, embed_dim=6),
        ),
    )


def test_fit_reduces_loss_and_resumes(tmp_path):
    store = make_synthetic_corpus(
        str(tmp_path / "corpus"), n_speakers=10, seconds_per_speaker=2.0
    )
    tr = Trainer(_tiny(), store, workdir=str(tmp_path / "runs"))

    # initial loss
    state0 = tr.init_state()
    l0, _ = tr.model.loss_from_batch(
        state0["params"], tr._dequantize(tr._device_batch(tr.mixer.batch("valid", 0, 2)))
    )
    state = tr.fit()
    l1, _ = tr.model.loss_from_batch(
        state["params"], tr._dequantize(tr._device_batch(tr.mixer.batch("valid", 0, 2)))
    )
    assert float(l1) < float(l0)

    # checkpoint written and restorable; step preserved
    restored = tr.restore()
    assert restored["step"] == 12
    np.testing.assert_allclose(
        np.asarray(restored["params"]["separator"]["proj"]["w"]),
        np.asarray(state["params"]["separator"]["proj"]["w"]),
        atol=0,
    )

    # deterministic data: same (seed, step) -> identical batch after "preemption"
    b1 = tr.mixer.batch("train", 5, 2)
    tr2 = Trainer(_tiny(), store, workdir=str(tmp_path / "runs2"))
    b2 = tr2.mixer.batch("train", 5, 2)
    np.testing.assert_array_equal(b1.sources, b2.sources)


def test_grad_accum_equals_full_batch(tmp_path):
    """accum_steps=2 computes the same update as the unaccumulated step (all
    losses are per-utterance means, so mean-of-microbatch-grads == full-batch
    grad up to fp summation order)."""
    store = make_synthetic_corpus(
        str(tmp_path / "corpus"), n_speakers=10, seconds_per_speaker=2.0
    )
    import jax.numpy as jnp
    import optax

    results = {}
    for accum in (1, 2):
        r = _tiny(steps=1)
        r = dataclasses.replace(
            r, train=dataclasses.replace(r.train, batch_size=4, accum_steps=accum)
        )
        tr = Trainer(r, store, workdir=str(tmp_path / f"runs{accum}"))
        # SGD: params delta = -lr * grads, so the comparison reads the grads
        # directly.  (One ADAM step from init is m̂/√v̂ ≈ sign(g) — it amplifies
        # fp summation noise in near-zero grads unboundedly.)
        tr.tx = optax.sgd(0.1)
        state = tr.init_state()
        tr._build_step()
        batch = tr._device_batch(tr._draw("train", 0, 4))
        p, o, m = tr._step_fn(
            state["params"], state["opt_state"], batch, None,
            jnp.float32(1.0), jnp.int32(0),
        )
        results[accum] = (p, {k: float(v) for k, v in m.items()})
    p1, m1 = results[1]
    p2, m2 = results[2]
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_ema_tracked_validated_and_served(tmp_path):
    """ema_decay > 0: the state carries EMA params, they differ from the raw
    params after training, checkpoint/restore preserves them, and
    load_model_from_run serves the EMA weights."""
    store = make_synthetic_corpus(
        str(tmp_path / "corpus"), n_speakers=10, seconds_per_speaker=2.0
    )
    r = _tiny(steps=8)
    r = dataclasses.replace(
        r, train=dataclasses.replace(r.train, ema_decay=0.9, valid_every=4)
    )
    tr = Trainer(r, store, workdir=str(tmp_path / "runs"))
    state = tr.fit()
    assert "ema_params" in state
    w = np.asarray(state["params"]["separator"]["proj"]["w"])
    we = np.asarray(state["ema_params"]["separator"]["proj"]["w"])
    assert not np.allclose(w, we)  # the average lags the raw weights

    restored = tr.restore()
    np.testing.assert_allclose(
        np.asarray(restored["ema_params"]["separator"]["proj"]["w"]), we, atol=0
    )

    from amss_tpu.train.engine import load_model_from_run

    _, served = load_model_from_run(tr.dir)
    np.testing.assert_allclose(
        np.asarray(served["separator"]["proj"]["w"]), we, atol=0
    )


def test_ema_restore_from_pre_ema_checkpoint(tmp_path):
    """Turning ema_decay on over an existing (pre-EMA) run dir restores
    cleanly — fit() seeds the average at the restored params — instead of
    raising the architecture-mismatch error."""
    store = make_synthetic_corpus(
        str(tmp_path / "corpus"), n_speakers=10, seconds_per_speaker=2.0
    )
    r0 = _tiny(steps=4)
    tr0 = Trainer(r0, store, workdir=str(tmp_path / "runs"))
    tr0.fit()

    r1 = dataclasses.replace(
        r0, train=dataclasses.replace(r0.train, ema_decay=0.9, steps=8)
    )
    tr1 = Trainer(r1, store, workdir=str(tmp_path / "runs"),
                  run_dir=tr0.dir)  # same dir: continue the old run
    state = tr1.restore()
    assert state["step"] == 4 and "ema_params" not in state
    state = tr1.fit(state)
    assert "ema_params" in state and state["step"] == 8


def test_valid_quality_curve_logged(tmp_path):
    """train.valid_quality logs valid/si_sdri (full inference path) next to
    valid/loss at every validation."""
    import json
    import os

    store = make_synthetic_corpus(
        str(tmp_path / "corpus"), n_speakers=10, seconds_per_speaker=2.0
    )
    r = _tiny(steps=6)
    r = dataclasses.replace(
        r, train=dataclasses.replace(r.train, valid_quality=True, valid_every=3)
    )
    tr = Trainer(r, store, workdir=str(tmp_path / "runs"))
    tr.fit()
    recs = [json.loads(l)
            for l in open(os.path.join(tr.dir, "metrics.jsonl"))]
    qs = [m["valid/si_sdri"] for m in recs if "valid/si_sdri" in m]
    assert len(qs) == 2 and all(np.isfinite(q) for q in qs)


def test_early_stopping(tmp_path):
    """early_stop_patience ends training after N stale validations; the
    returned step reflects the actual stop point and ckpt_best survives."""
    import os

    store = make_synthetic_corpus(
        str(tmp_path / "corpus"), n_speakers=10, seconds_per_speaker=2.0
    )
    r = _tiny(steps=40)
    # lr=0: valid loss never improves after the first validation
    r = dataclasses.replace(
        r, train=dataclasses.replace(
            r.train, lr=0.0, valid_every=2, early_stop_patience=2
        )
    )
    tr = Trainer(r, store, workdir=str(tmp_path / "runs"))
    state = tr.fit()
    # first validation sets best; the next 2 are stale -> stop at step 6
    assert state["step"] == 6 < 40
    assert os.path.exists(os.path.join(tr.dir, "ckpt_best.msgpack"))


def test_corpus_collision_guard(tmp_path):
    """Same config on a different corpus must refuse the colliding run dir
    (the run id hashes the config only — round-3 trap that silently
    overwrote a trained run)."""
    import pytest

    a = make_synthetic_corpus(str(tmp_path / "corpus_a"), n_speakers=12,
                              seconds_per_speaker=2.0)
    b = make_synthetic_corpus(str(tmp_path / "corpus_b"), n_speakers=12,
                              seconds_per_speaker=2.0)
    tr = Trainer(_tiny(steps=2), a, workdir=str(tmp_path / "runs"))
    tr.fit()
    # same corpus: reuse is fine (resume path)
    Trainer(_tiny(steps=2), a, workdir=str(tmp_path / "runs"))
    with pytest.raises(ValueError, match="corpus"):
        Trainer(_tiny(steps=2), b, workdir=str(tmp_path / "runs"))


def test_steps_per_call_matches_single_step(tmp_path):
    """K optimizer steps scanned inside one jitted call must reproduce the
    K=1 trajectory (same batches, same dropout keys, same freeze-front
    gating — steps_per_call is an execution-shape knob only).  Covers a
    freeze transition INSIDE a chunk and the remainder chunk before a
    validation boundary (valid_every=6, K=4 -> chunks 4,2,4,2)."""
    store = make_synthetic_corpus(str(tmp_path / "corpus"), n_speakers=12,
                                  seconds_per_speaker=2.0)
    outs = {}
    for K in (1, 4):
        r = _tiny(steps=12)
        r = dataclasses.replace(
            r,
            freeze_front_steps=3,
            train=dataclasses.replace(r.train, steps_per_call=K,
                                      ema_decay=0.995),
        )
        tr = Trainer(r, store, workdir=str(tmp_path / f"runs_k{K}"))
        outs[K] = tr.fit()
    for key in ("params", "ema_params"):
        a = jax.tree_util.tree_leaves(outs[1][key])
        b = jax.tree_util.tree_leaves(outs[4][key])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-5, atol=2e-6)
    assert outs[1]["step"] == outs[4]["step"] == 12


def test_steps_per_call_device_data(tmp_path):
    """steps_per_call composes with the HBM-resident corpus: stacked
    (speaker, start, gain) plans gathered per scanned step equal the
    host-wire run (int16 quantization is the only wire difference, and
    device_data gathers from the SAME int16 shards)."""
    store = make_synthetic_corpus(str(tmp_path / "corpus"), n_speakers=12,
                                  seconds_per_speaker=2.0)
    outs = {}
    for K in (1, 3):
        r = _tiny(steps=6)
        r = dataclasses.replace(
            r, train=dataclasses.replace(r.train, steps_per_call=K,
                                         device_data=True))
        tr = Trainer(r, store, workdir=str(tmp_path / f"runs_dd{K}"))
        outs[K] = tr.fit()
    for x, y in zip(jax.tree_util.tree_leaves(outs[1]["params"]),
                    jax.tree_util.tree_leaves(outs[3]["params"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-6)


def test_steps_per_call_resume_from_restored_ckpt(tmp_path):
    """Resume through tr.restore() must work at steps_per_call > 1.

    Regression: msgpack-restored checkpoints hold `step` as a read-only 0-d
    numpy array; `_fit_multi`'s `step += k` mutated it in place and raised
    `ValueError: output array is read-only` (found live in round 5 when the
    96k chain switched to K=20 and restored after a tunnel hang).  The
    resumed trajectory must also match an uninterrupted run."""
    store = make_synthetic_corpus(str(tmp_path / "corpus"), n_speakers=12,
                                  seconds_per_speaker=2.0)

    def recipe(steps, K):
        r = _tiny(steps=steps)
        return dataclasses.replace(
            r, train=dataclasses.replace(r.train, steps_per_call=K,
                                         ema_decay=0.995))

    # uninterrupted reference run, K=4, 12 steps
    ref = Trainer(recipe(12, 4), store, workdir=str(tmp_path / "runs_ref"))
    want = ref.fit()

    # interrupted run: stop at 6 (valid boundary -> ckpt), restore, continue
    tr = Trainer(recipe(6, 4), store, workdir=str(tmp_path / "runs_a"))
    tr.fit()
    tr2 = Trainer(recipe(12, 4), store, workdir=str(tmp_path / "runs_b"))
    state = tr.restore()
    assert state["step"] == 6
    got = tr2.fit(state)  # raised before the fix
    assert got["step"] == 12
    for key in ("params", "ema_params"):
        for x, y in zip(jax.tree_util.tree_leaves(want[key]),
                        jax.tree_util.tree_leaves(got[key])):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-5, atol=2e-6)
