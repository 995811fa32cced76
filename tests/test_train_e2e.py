"""End-to-end slice (SURVEY.md §7 step 3): data -> front -> BLSTM -> DPCL loss
-> Adam on tiny shapes; loss decreases; checkpoint/resume is exact."""

import dataclasses

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
