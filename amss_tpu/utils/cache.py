"""Persistent XLA compilation cache.

Compiles through the axon tunnel cost minutes (e.g. the grad-of-scan train
step: ~4 min); the JAX persistent compilation cache amortizes them across
processes and restarts.  Call early (before first jit execution).
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.expanduser("~/.cache/amss_tpu_xla")


def _host_tag() -> str:
    """Per-host-CPU cache namespace.  XLA:CPU persists AOT executables whose
    cache key does NOT cover host CPU features; a cache written on one VM and
    read on another (observed across session restarts here) loads machine-
    mismatched code with a SIGILL warning.  TPU programs are host-agnostic,
    but the same cache dir also holds CPU entries, so namespace by a
    fingerprint of the CPU flags."""
    import hashlib

    try:
        lines = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                # flags alone proved too weak a key: two VMs with identical
                # flag sets still disagreed on XLA-inferred target features
                # (prefer-no-scatter/gather), so include the model line too.
                if line.startswith(("flags", "model name")):
                    lines.append(line)
                if len(lines) >= 2:
                    break
        if lines:
            return hashlib.sha256("".join(sorted(lines)).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine()


def enable_compilation_cache(directory: str | None = None) -> str:
    d = directory or os.environ.get("AMSS_XLA_CACHE", _DEFAULT)
    d = os.path.join(d, _host_tag())
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # Cache everything, even fast compiles (the tunnel round-trip dominates).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
