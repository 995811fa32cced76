"""Kernel dispatch: Pallas on TPU, jnp reference elsewhere.

AMSS_PALLAS=1 forces Pallas (interpret mode off-TPU), AMSS_PALLAS=0 forces the
jnp path, default 'auto' uses Pallas exactly when the default backend is TPU.
Decision happens at trace time (host Python), so jit caches stay consistent
per backend.
"""

from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    env = os.environ.get("AMSS_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"
