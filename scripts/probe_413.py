"""Probe the axon tunnel's remote_compile body limit vs jit-argument size.

Round-3 finding: the device-resident corpus (data/device_corpus.py) is
threaded into the train step as a jit ARGUMENT (and a CPU lowering test
proves it enters the StableHLO as a parameter, not a constant), yet the
first step on the real tunnel still died with
    remote_compile: HTTP 413 Failed to buffer the request body
at corpus size ~350 MB.  Hypothesis: the tunnel's compile request bundles
(some of) the argument buffers alongside the module (speculative execute /
cassette recording), so compile-request size scales with first-call arg
sizes even when the HLO itself is tiny.

This probe jits a trivial gather over an int16 device array and bisects the
array size at which compile fails.  Run it ONLY when the chip is idle.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.data.device_corpus import _upload_slabbed


def try_size(mbytes: int, sharded: bool = True) -> str:
    n = (mbytes << 20) // 2  # int16
    host = np.zeros(n, np.int16)
    sharding = None
    if sharded:  # mirror the engine path exactly (replicated NamedSharding)
        from amss_tpu.parallel.mesh import make_mesh, replicated_sharding

        sharding = replicated_sharding(make_mesh())
    t0 = time.time()
    try:
        flat = _upload_slabbed(host, sharding)
        _ = np.asarray(flat[:4])  # sync: surface any async upload error HERE
    except Exception as e:  # noqa: BLE001
        return f"UPLOAD FAIL: {type(e).__name__}: {str(e)[:200]}"
    up = time.time() - t0

    # Fresh function object per size so the jit cache never reuses an
    # executable across probe points (shape differs anyway, but be explicit).
    def gather(flat, idx):
        def one(off):
            return jax.lax.dynamic_slice_in_dim(flat, off, 128)

        return jax.vmap(one)(idx).astype(jnp.float32).sum()

    fn = jax.jit(gather)
    idx = jnp.arange(8, dtype=jnp.int32) * 1000
    t0 = time.time()
    try:
        out = fn(flat, idx)
        _ = np.asarray(out)  # force through the tunnel
    except Exception as e:  # noqa: BLE001
        return f"COMPILE/RUN FAIL: {type(e).__name__}: {str(e)[:200]}"
    return f"ok (upload {up:.1f}s, compile+run {time.time() - t0:.1f}s)"


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [64, 128, 192, 256, 320, 384]
    for mb in sizes:
        print(f"--- {mb} MB: {try_size(mb)}", flush=True)
