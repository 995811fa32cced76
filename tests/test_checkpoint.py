"""Checkpoints: save/restore round-trip, best retention, partial restore."""

import jax.numpy as jnp
import numpy as np

from amss_tpu.ckpt.checkpoint import (
    AsyncCheckpointer,
    read_manifest,
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


def test_manifest_embedded_in_blob(tmp_path):
    """Step/metric ride INSIDE the msgpack blob (one atomic rename), so a
    stale/missing sidecar .json can never mis-rank ckpt_best."""
    import os

    d = str(tmp_path / "ckpt")
    save_checkpoint(d, _state(1.0), step=7, metric=0.25)
    # Corrupt the sidecars: restore + best-ranking must not care.
    for n in os.listdir(d):
        if n.endswith(".json"):
            os.remove(os.path.join(d, n))
    m = read_manifest(os.path.join(d, "ckpt_latest.msgpack"))
    assert m == {"step": 7, "metric": 0.25}
    _, manifest = restore_checkpoint(d, _state(0.0))
    assert manifest["step"] == 7
    # best-ranking reads the embedded meta of the existing best blob
    save_checkpoint(d, _state(2.0), step=8, metric=0.9)  # worse
    best, bman = restore_checkpoint(d, _state(0.0), best=True)
    np.testing.assert_allclose(best["params"]["front"]["w"], 1.0)


def test_async_checkpointer(tmp_path):
    d = str(tmp_path / "ckpt")
    ck = AsyncCheckpointer()
    for i in range(3):
        ck.save(d, _state(float(i + 1)), step=i + 1, metric=1.0 / (i + 1))
    ck.wait()
    latest, man = restore_checkpoint(d, _state(0.0))
    assert man["step"] == 3
    best, bman = restore_checkpoint(d, _state(0.0), best=True)
    assert bman["step"] == 3  # metric monotonically improved
    # reusable after wait()
    ck.save(d, _state(9.0), step=9, metric=9.0)
    ck.wait()
    latest2, man2 = restore_checkpoint(d, _state(0.0))
    assert man2["step"] == 9


def test_partial_restore_front_only(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, _state(5.0), step=1, metric=0.5)
    fresh = _state(0.0)["params"]
    merged = restore_subtree(d, fresh, keys=["front"], best=True)
    np.testing.assert_allclose(merged["front"]["w"], 5.0)  # restored
    np.testing.assert_allclose(merged["separator"]["p"], 0.0)  # untouched
