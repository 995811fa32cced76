"""Numerical-safety rails (SURVEY.md §5.2).

No TSAN analogue is needed (single jit program, no host threads share device
state); the failure modes that matter are NaN/Inf blowups and nondeterminism.

  * ``nan_guard()`` — enable jax debug_nans for a scope (training debug runs).
  * ``check_finite(tree)`` — host-side assertion over a pytree of metrics.
  * Determinism is by construction: stateless Mixer (seed, step), fixed-seed
    param init, no nondeterministic collectives; locked by the golden tests
    (tests/test_goldens.py) and the Mixer determinism tests (tests/test_data.py).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_guard():
    with jax.debug_nans(True):
        yield


def check_finite(tree, where: str = "") -> None:
    leaves, _ = jax.tree_util.tree_flatten(tree)
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite value in {where or 'pytree'} leaf {i}: "
                f"nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()}"
            )
