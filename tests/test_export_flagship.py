"""scripts/export_flagship.py arm selection (round-4 addition).

The committed flagship is now an EMA run (checkpoints/c6_flagship), and
load_model_from_run serves ema_params when a run-dir checkpoint carries them
— so the params-only exporter must be able to pick EITHER arm explicitly,
and the exported blob must restore as plain {"params": ...}.
"""

import json
import os
import sys

import flax.serialization as fser
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from export_flagship import export  # noqa: E402

from amss_tpu.ckpt.checkpoint import _split_raw, save_checkpoint


def _fake_run(tmp_path):
    run = tmp_path / "run"
    state = {
        "params": {"w": jnp.full((3,), 1.0)},
        "opt_state": {"m": jnp.zeros((3,))},
        "ema_params": {"w": jnp.full((3,), 2.0)},
    }
    save_checkpoint(str(run), state, step=7, metric=-1.0)
    with open(run / "config.json", "w") as f:
        json.dump({"kind": "test"}, f)
    return run


def _exported_params(out_dir):
    with open(os.path.join(out_dir, "ckpt_best.msgpack"), "rb") as f:
        raw = fser.msgpack_restore(f.read())
    state, manifest = _split_raw(raw)
    return state, manifest


def test_export_raw_and_ema_arms(tmp_path):
    run = _fake_run(tmp_path)
    for arm, expect in (("raw", 1.0), ("ema", 2.0)):
        out = tmp_path / f"out_{arm}"
        export(str(run), str(out), arm)
        state, manifest = _exported_params(str(out))
        assert set(state.keys()) == {"params"}, state.keys()
        np.testing.assert_allclose(np.asarray(state["params"]["w"]),
                                   np.full((3,), expect))
        assert manifest["exported_arm"] == arm
        assert manifest["step"] == 7
        assert os.path.exists(out / "config.json")
        assert json.load(open(out / "EXPORT.json"))["exported_arm"] == arm


def test_export_default_is_raw(tmp_path):
    run = _fake_run(tmp_path)
    out = tmp_path / "out_default"
    export(str(run), str(out))
    state, _ = _exported_params(str(out))
    np.testing.assert_allclose(np.asarray(state["params"]["w"]),
                               np.full((3,), 1.0))


def test_committed_flagship_is_the_ema_arm():
    """The repo's live claim: checkpoints/c6_flagship is the bf16 96k L16
    EMA arm (PARITY.md current-best row cites flagship_bf16_L16_max_96k_ema,
    promoted round 5: paired +2.18 [2.11, 2.25] over the 48k arm)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "checkpoints", "c6_flagship", "EXPORT.json")
    meta = json.load(open(path))
    assert meta.get("exported_arm") == "ema", meta
    assert meta.get("step") == 96000, meta
    cfg = json.load(open(os.path.join(repo, "checkpoints", "c6_flagship",
                                      "config.json")))
    assert cfg["model"]["front"]["filter_len"] == 16, cfg["model"]["front"]
