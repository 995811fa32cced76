"""HBM-resident corpus mode: gather parity with the host path, wrap
semantics, end-to-end training equivalence."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from amss_tpu.data.device_corpus import DeviceCorpus
from amss_tpu.data.mixer import Mixer
from amss_tpu.data.synthetic import make_synthetic_corpus


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synthetic_corpus(str(root / "c"), n_speakers=8,
                                 seconds_per_speaker=3.0)


def test_gather_matches_host_batch(store):
    t = 2048
    mixer = Mixer(store, nb_speakers=2, chunk_samples=t, seed=3)
    corpus = DeviceCorpus(store, chunk_samples=t)
    for step in (0, 7):
        plan = mixer.plan("train", step, 4)
        host = mixer.batch("train", step, 4)
        np.testing.assert_array_equal(plan.speaker_ids, host.speaker_ids)
        dev = np.asarray(
            corpus.gather(
                jnp.asarray(plan.speaker_ids),
                jnp.asarray(plan.starts),
                jnp.asarray(plan.gains),
            )
        )
        # int16 HBM residency quantizes: tolerance is one LSB * gain
        atol = float(plan.gains.max()) / 32767.0 + 1e-6
        np.testing.assert_allclose(dev, host.sources, atol=atol)


def test_wrap_semantics_short_shard(store):
    """A start near the shard end reads the tiled continuation — identical to
    Mixer._chunk_wrap."""
    from amss_tpu.data.mixer import _chunk_wrap

    t = 4096
    corpus = DeviceCorpus(store, chunk_samples=t)
    w = np.asarray(store.waveform(store.speakers[0]), np.float32)
    start = len(w) - 100  # forces wrap
    got = np.asarray(
        corpus.gather(
            jnp.asarray([[0]], jnp.int32),
            jnp.asarray([[start]], jnp.int32),
            jnp.asarray([[1.0]], jnp.float32),
        )
    )[0, 0]
    q = np.clip(np.round(w * 32767.0), -32767, 32767) / 32767.0
    want = _chunk_wrap(q.astype(np.float32), start, t)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_train_step_parity_device_vs_host(store, tmp_path):
    """Same (seed, step): the device-data step must see the same audio (to
    int16 quantization) and produce a near-identical loss."""
    import jax

    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.train.engine import Trainer

    def recipe(device):
        r = c1_stft_dpcl()
        return dataclasses.replace(
            r,
            model=dataclasses.replace(
                r.model,
                sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4),
            ),
            train=dataclasses.replace(
                r.train, batch_size=2, chunk_samples=2048, steps=1,
                valid_every=10**9, device_data=device,
            ),
        )

    losses = {}
    for device in (False, True):
        tr = Trainer(recipe(device), store, workdir=str(tmp_path))
        st = tr.init_state()
        tr._build_step()
        hb = tr._draw("train", 0, 2)
        batch = tr._device_batch(hb)
        cf = tr.corpus.flat if tr.corpus is not None else None
        metrics = tr._valid_fn(st["params"], batch, cf)
        losses[device] = float(metrics["loss"])
    assert abs(losses[True] - losses[False]) < 1e-3, losses


def test_corpus_is_jit_parameter_not_constant(store, tmp_path):
    """Regression for the tunnel HTTP-413 failure: the HBM-resident corpus
    must enter the compiled train step as a PARAMETER.  A closure-captured
    device array is constant-folded into the lowered HLO, which bloats every
    compile by the corpus size and overflows the axon remote_compile request
    body at production corpus sizes (observed at ~330 MB / 500 speakers)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.train.engine import Trainer

    r = c1_stft_dpcl()
    r = dataclasses.replace(
        r,
        model=dataclasses.replace(
            r.model,
            sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4),
        ),
        train=dataclasses.replace(
            r.train, batch_size=2, chunk_samples=2048, steps=1,
            valid_every=10**9, device_data=True,
        ),
    )
    tr = Trainer(r, store, workdir=str(tmp_path))
    st = tr.init_state()
    tr._build_step()
    batch = tr._device_batch(tr._draw("train", 0, 2))
    lowered = tr._step_fn.lower(
        st["params"], st["opt_state"], batch, tr.corpus.flat,
        jnp.float32(1.0), jnp.int32(0),
    )
    text = lowered.as_text()  # StableHLO MLIR
    size = tr.corpus.flat.size
    corpus_lines = [l for l in text.splitlines() if f"tensor<{size}xi16>" in l]
    assert corpus_lines, "corpus-shaped value missing from lowered module"
    assert all("constant" not in l for l in corpus_lines), (
        "corpus was constant-folded into the program"
    )
    # The corpus must appear in the entry signature (an %argN of main), i.e.
    # the compile payload carries its SHAPE, not its data.
    assert any("%arg" in l and "func.func" in l for l in corpus_lines), corpus_lines[:2]


def test_413_fallback_to_host_input(store, tmp_path):
    """If the tunnel rejects the device-data step's compile payload (HTTP 413
    at production corpus sizes), fit() must warn and fall back to the host
    int16-wire input path BEFORE any donated buffer is consumed — not die
    ten minutes into a run."""
    import warnings

    import jax

    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.train.engine import Trainer

    r = c1_stft_dpcl()
    r = dataclasses.replace(
        r,
        model=dataclasses.replace(
            r.model,
            sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4),
        ),
        train=dataclasses.replace(
            r.train, batch_size=2, chunk_samples=2048, steps=2,
            valid_every=10**9, device_data=True,
        ),
    )
    tr = Trainer(r, store, workdir=str(tmp_path))

    def fake_compile(state, batch0):
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 413: "
            "Failed to buffer the request body: length limit exceeded"
        )

    tr._compile_step = fake_compile
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        state = tr.fit()
    assert tr.corpus is None, "fallback did not disable device-data mode"
    assert state["step"] == 2
    assert any("falling back to host" in str(w.message) for w in caught), [
        str(w.message) for w in caught
    ]


def test_probe_reraises_other_errors(store, tmp_path):
    """Non-413 compile failures must propagate unchanged."""
    import jax

    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.train.engine import Trainer

    r = c1_stft_dpcl()
    r = dataclasses.replace(
        r,
        model=dataclasses.replace(
            r.model,
            sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4),
        ),
        train=dataclasses.replace(
            r.train, batch_size=2, chunk_samples=2048, steps=1,
            valid_every=10**9, device_data=True,
        ),
    )
    tr = Trainer(r, store, workdir=str(tmp_path))

    def fake_compile(state, batch0):
        raise jax.errors.JaxRuntimeError("INTERNAL: some other failure")

    tr._compile_step = fake_compile
    with pytest.raises(jax.errors.JaxRuntimeError, match="other failure"):
        tr.fit()
