"""Pytree checkpoints with scope-filtered partial restore.

Capability parity: the reference's tf.train.Saver flow (SURVEY.md §5.4):
full-graph checkpoints, best-on-validation retention, and — load-bearing for
the finetune recipe (SURVEY.md §3.3) — restoring only a variable subset
(pretrained front/back into a fresh separator graph).  Here params are plain
dict pytrees, so "scope-filtered restore" is just picking a subtree by its
top-level key ("front", "separator").

Format: msgpack via flax.serialization + a JSON manifest (step, metric,
config hash).  Writes are atomic (tmp + rename) so a preempted TPU job never
sees a torn checkpoint (SURVEY.md §5.3).
"""

from __future__ import annotations

import json
import os

import flax.serialization as fser
import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    state: dict,
    step: int,
    metric: float | None = None,
    keep_best: bool = True,
) -> str:
    """Save ``state`` (any dict pytree, e.g. {params, opt_state}) atomically.

    Writes ``<dir>/ckpt_latest.msgpack``; if ``metric`` improves on the stored
    best (lower is better), also updates ``ckpt_best.msgpack``.
    """
    os.makedirs(directory, exist_ok=True)
    blob = fser.to_bytes(_to_host(state))

    def _write(name: str, manifest: dict):
        tmp = os.path.join(directory, f".tmp_{name}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(directory, name))
        mtmp = os.path.join(directory, f".tmp_{name}.json")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(directory, f"{name}.json"))

    manifest = {"step": step, "metric": metric}
    _write("ckpt_latest.msgpack", manifest)

    if keep_best and metric is not None:
        best_path = os.path.join(directory, "ckpt_best.msgpack.json")
        best_metric = None
        if os.path.exists(best_path):
            with open(best_path) as f:
                best_metric = json.load(f).get("metric")
        if best_metric is None or metric < best_metric:
            _write("ckpt_best.msgpack", manifest)
    return os.path.join(directory, "ckpt_latest.msgpack")


def restore_checkpoint(directory: str, target: dict, best: bool = False) -> tuple[dict, dict]:
    """Restore into the structure of ``target``.  Returns (state, manifest)."""
    name = "ckpt_best.msgpack" if best else "ckpt_latest.msgpack"
    path = os.path.join(directory, name)
    with open(path, "rb") as f:
        state = fser.from_bytes(target, f.read())
    with open(path + ".json") as f:
        manifest = json.load(f)
    return state, manifest


def restore_subtree(
    directory: str, target_params: dict, keys: list[str], best: bool = True
) -> dict:
    """Scope-filtered restore: overwrite only ``keys`` subtrees of
    ``target_params`` from a checkpoint whose params contain those keys.

    This is the reference's partial-Saver pattern (pretrained adapt front/back
    into the joint finetune graph, SURVEY.md §3.3).
    """
    name = "ckpt_best.msgpack" if best else "ckpt_latest.msgpack"
    path = os.path.join(directory, name)
    with open(path, "rb") as f:
        raw = fser.msgpack_restore(f.read())
    src_params = raw["params"] if "params" in raw else raw
    out = dict(target_params)
    for k in keys:
        if k not in src_params:
            raise KeyError(f"checkpoint at {directory} has no subtree {k!r}")
        tgt = target_params[k]
        out[k] = fser.from_state_dict(tgt, fser.to_state_dict(src_params[k]))
    return out


def best_checkpoint_dir(root: str, rid: str) -> str:
    return os.path.join(root, rid)
