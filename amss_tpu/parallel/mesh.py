"""Device mesh + sharding layout (the framework's entire 'distributed backend').

The reference has NO multi-device capability (SURVEY.md §2.7) — this layer is
new, TPU-native scale-out: a 1-D ``data`` mesh; batches sharded over it,
params replicated; XLA inserts the gradient psum over ICI inside the single
jit train step.  No NCCL/MPI analogue exists or is needed — the XLA runtime is
the collective backend (SURVEY.md §5.8).

Model sizes here (BLSTM <= ~10M params) never need TP/PP; the L41 centroid
table could shard over ``data`` if a corpus had millions of speakers
(SURVEY.md §2.7), which batch_sharding supports via a custom PartitionSpec.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_data`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is not None:
        if n_data > len(devices):
            raise ValueError(f"asked for {n_data} devices, have {len(devices)}")
        devices = devices[:n_data]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] multi-step batches: step axis replicated (it is scanned
    sequentially inside the jit step), batch axis split across ``data``."""
    return NamedSharding(mesh, P(None, "data"))


def shard_batch(mesh: Mesh, tree):
    """device_put a host batch pytree with the leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
