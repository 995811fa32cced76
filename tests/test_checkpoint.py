"""Checkpoints: save/restore round-trip, best retention, partial restore."""

import jax.numpy as jnp
import numpy as np

from amss_tpu.ckpt.checkpoint import (
    restore_checkpoint,
    restore_subtree,
    save_checkpoint,
)


def _state(x):
    return {
        "params": {
            "front": {"w": jnp.full((3, 3), x)},
            "separator": {"p": jnp.full((2,), x * 2)},
        },
        "step": int(x),
    }


def test_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, _state(1.0), step=1, metric=0.5)
    restored, manifest = restore_checkpoint(d, _state(0.0))
    np.testing.assert_allclose(restored["params"]["front"]["w"], 1.0)
    assert manifest["step"] == 1


def test_best_retention(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, _state(1.0), step=1, metric=0.5)
    save_checkpoint(d, _state(2.0), step=2, metric=0.9)  # worse — best stays
    save_checkpoint(d, _state(3.0), step=3, metric=0.1)  # better — best moves
    latest, _ = restore_checkpoint(d, _state(0.0))
    best, bman = restore_checkpoint(d, _state(0.0), best=True)
    assert latest["step"] == 3
    np.testing.assert_allclose(best["params"]["front"]["w"], 3.0)
    assert bman["metric"] == 0.1

    save_checkpoint(d, _state(4.0), step=4, metric=0.7)
    best2, bman2 = restore_checkpoint(d, _state(0.0), best=True)
    assert bman2["metric"] == 0.1  # unchanged


def test_partial_restore_front_only(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, _state(5.0), step=1, metric=0.5)
    fresh = _state(0.0)["params"]
    merged = restore_subtree(d, fresh, keys=["front"], best=True)
    np.testing.assert_allclose(merged["front"]["w"], 5.0)  # restored
    np.testing.assert_allclose(merged["separator"]["p"], 0.0)  # untouched
