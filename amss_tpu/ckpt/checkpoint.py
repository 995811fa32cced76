"""Pytree checkpoints with scope-filtered partial restore.

Capability parity: the reference's tf.train.Saver flow (SURVEY.md §5.4):
full-graph checkpoints, best-on-validation retention, and — load-bearing for
the finetune recipe (SURVEY.md §3.3) — restoring only a variable subset
(pretrained front/back into a fresh separator graph).  Here params are plain
dict pytrees, so "scope-filtered restore" is just picking a subtree by its
top-level key ("front", "separator").

Format: one msgpack file per checkpoint carrying BOTH the manifest (step,
metric) and the state — a single atomic rename, so a crash can never pair a
new blob with a stale manifest (that two-file race could mis-rank ckpt_best).
A sidecar ``.json`` manifest is still written for human inspection, but the
embedded meta is authoritative.  Writes are atomic (tmp + rename) so a
preempted TPU job never sees a torn checkpoint (SURVEY.md §5.3).
"""

from __future__ import annotations

import json
import os
import queue
import threading

import flax.serialization as fser
import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _split_raw(raw: dict) -> tuple[dict, dict]:
    """(state_dict, manifest) from a restored msgpack — handles both the
    current {"meta": ..., "state": ...} format and the legacy bare-state one."""
    if isinstance(raw, dict) and set(raw.keys()) == {"meta", "state"}:
        return raw["state"], dict(raw["meta"])
    return raw, {}


def read_manifest(path: str) -> dict:
    """Authoritative manifest of a checkpoint file (embedded meta; falls back
    to the sidecar .json for legacy checkpoints)."""
    with open(path, "rb") as f:
        raw = fser.msgpack_restore(f.read())
    _, manifest = _split_raw(raw)
    if not manifest and os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            manifest = json.load(f)
    return manifest


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
    manifest = {"step": step, "metric": metric}
    blob = fser.to_bytes({"meta": manifest, "state": _to_host(state)})

    def _write(name: str):
        tmp = os.path.join(directory, f".tmp_{name}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(directory, name))
        # Sidecar for humans/tools; the blob's embedded meta is authoritative.
        mtmp = os.path.join(directory, f".tmp_{name}.json")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(directory, f"{name}.json"))

    _write("ckpt_latest.msgpack")

    if keep_best and metric is not None:
        best_blob = os.path.join(directory, "ckpt_best.msgpack")
        best_metric = None
        if os.path.exists(best_blob):
            best_metric = read_manifest(best_blob).get("metric")
        if best_metric is None or metric < best_metric:
            _write("ckpt_best.msgpack")
    return os.path.join(directory, "ckpt_latest.msgpack")


def restore_checkpoint(directory: str, target: dict, best: bool = False) -> tuple[dict, dict]:
    """Restore into the structure of ``target``.  Returns (state, manifest)."""
    name = "ckpt_best.msgpack" if best else "ckpt_latest.msgpack"
    path = os.path.join(directory, name)
    with open(path, "rb") as f:
        raw = fser.msgpack_restore(f.read())
    state_dict, manifest = _split_raw(raw)
    if not manifest and os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            manifest = json.load(f)
    try:
        state = fser.from_state_dict(target, state_dict)
    except (ValueError, KeyError) as e:
        # Most common cause: the recipe's default architecture moved under a
        # checkpoint (e.g. c6's default trunk switched dprnn -> tcn in round
        # 2), so the param tree no longer matches.  Surface the fix instead
        # of flax's opaque tree-structure error (advisor r2).
        raise ValueError(
            f"checkpoint {path} does not match the model built from the "
            "current recipe/overrides — if this run predates a recipe "
            "default change, pass the architecture it was trained with "
            "(e.g. a pre-round-2 c6 run needs --trunk dprnn --blocks 6); "
            f"original error: {e}"
        ) from e
    return state, manifest


class AsyncCheckpointer:
    """Background-thread checkpoint writes (SURVEY.md §5.3 'periodic async').

    The device->host fetch happens ON the caller's thread (it must — the
    arrays are donated/updated by the next step), then serialization + file
    I/O run on one worker thread so the train loop never stalls on disk.
    ``wait()`` drains pending writes (call at fit end and before restore)."""

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self._thread: threading.Thread | None = None

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            directory, host_state, step, metric = item
            try:
                save_checkpoint(directory, host_state, step=step, metric=metric)
            except Exception:  # noqa: BLE001 — never kill the writer thread
                import logging

                logging.getLogger(__name__).exception("async checkpoint save failed")

    def save(self, directory: str, state: dict, step: int, metric: float | None = None):
        host_state = _to_host(state)  # synchronous fetch; write is async
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        self._q.put((directory, host_state, step, metric))

    def wait(self):
        if self._thread is not None:
            self._q.put(None)
            self._thread.join()
            self._thread = None


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
    raw, _ = _split_raw(raw)
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
