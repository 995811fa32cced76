"""Test env: CPU backend with 8 virtual devices for sharding tests.

Must run before jax initializes — pytest imports conftest first, so setting
env vars here is safe as long as no test module imports jax at collection
time before this file loads (pytest guarantees conftest loads first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize force-sets jax_platforms="axon,cpu" via jax.config at
# interpreter start (overriding the env var), which would silently run "CPU"
# tests on the real TPU chip.  Override the config itself.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
