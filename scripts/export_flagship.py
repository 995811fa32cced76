"""Export a params-only flagship checkpoint into the repo (VERDICT r2 items
2/6-weak): run dirs are gitignored and /tmp is wiped on restarts, so the
trained flagships vanished every round and bench.py timed RANDOM weights.

`python scripts/export_flagship.py <run_dir> <checkpoints/name>` writes a
minimal run-dir-shaped directory (config.json + ckpt_best.msgpack holding
ONLY {"params": ...}, no opt_state) that load_model_from_run() restores
as-is.  bench.py picks these up when present.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.serialization as fser

from amss_tpu.ckpt.checkpoint import _split_raw


def export(run_dir: str, out_dir: str, arm: str = "raw") -> None:
    """arm: "raw" exports state["params"]; "ema" exports state["ema_params"]
    (the weights load_model_from_run would serve from an EMA run — engine.py
    load prefers ema_params when a checkpoint carries them)."""
    src = os.path.join(run_dir, "ckpt_best.msgpack")
    if not os.path.exists(src):
        src = os.path.join(run_dir, "ckpt_latest.msgpack")
    with open(src, "rb") as f:
        raw = fser.msgpack_restore(f.read())
    state, manifest = _split_raw(raw)
    params = state["ema_params"] if arm == "ema" else state["params"]
    manifest = dict(manifest, exported_arm=arm)
    os.makedirs(out_dir, exist_ok=True)
    blob = fser.to_bytes({"meta": manifest, "state": {"params": params}})
    with open(os.path.join(out_dir, "ckpt_best.msgpack"), "wb") as f:
        f.write(blob)
    shutil.copy(os.path.join(run_dir, "config.json"),
                os.path.join(out_dir, "config.json"))
    with open(os.path.join(out_dir, "EXPORT.json"), "w") as f:
        json.dump({"source_run": os.path.abspath(run_dir), **manifest}, f)
    print(f"exported {src} -> {out_dir} "
          f"({os.path.getsize(os.path.join(out_dir, 'ckpt_best.msgpack'))} bytes, "
          f"manifest {manifest})")


if __name__ == "__main__":
    export(sys.argv[1], sys.argv[2],
           sys.argv[3] if len(sys.argv) > 3 else "raw")
