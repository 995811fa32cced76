"""Microbenchmark: fused Pallas front-end kernels vs the jnp/XLA reference.

Measures steady-state latency of the analysis (framing+DFT matmul) and
synthesis (decode-matmul+OLA) paths at serving shapes on the real chip.
Timing syncs via host fetch (axon block_until_ready is a no-op).

Usage: python scripts/kernel_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:4]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    r = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(r).ravel()[:4]
    return (time.perf_counter() - t0) / iters


def main():
    from amss_tpu.ops.framing import frame_signal, overlap_add
    from amss_tpu.ops.pallas.framed_matmul import pallas_stft_ri
    from amss_tpu.ops.pallas.ola import pallas_decode_ola
    from amss_tpu.ops.stft import stft_ri, idft_matrices, hann_window
    from amss_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    win, hop = 256, 64
    b, t = 8, 64000  # the bench serving shape: 8 x 8 s
    x = jnp.asarray(rng.standard_normal((b, t)), jnp.float32)

    p_stft = jax.jit(lambda x: pallas_stft_ri(x, win, hop))
    j_stft = jax.jit(lambda x: stft_ri(x, win, hop))
    tp = timeit(p_stft, x)
    tj = timeit(j_stft, x)
    gb = b * t * 4 / 1e9
    print(f"analysis  (STFT {b}x{t}): pallas {tp*1e3:.2f} ms  jnp {tj*1e3:.2f} ms "
          f"(speedup {tj/tp:.2f}x; input {gb*1000:.1f} MB)")

    nf = (t - win) // hop + 1
    f = win // 2 + 1
    codes = jnp.asarray(rng.standard_normal((b, nf, 2 * f)), jnp.float32)
    window = hann_window(win)
    ci, si = idft_matrices(win)
    basis = jnp.asarray(np.concatenate([ci, si], axis=0) * window[None, :])

    p_dec = jax.jit(lambda c: pallas_decode_ola(c, basis, hop, length=t))
    def jnp_dec(c):
        frames = jnp.matmul(c, basis, precision="highest")
        return overlap_add(frames, hop, length=t)
    j_dec = jax.jit(jnp_dec)
    tp = timeit(p_dec, codes)
    tj = timeit(j_dec, codes)
    print(f"synthesis (iSTFT-shape decode+OLA): pallas {tp*1e3:.2f} ms  "
          f"jnp {tj*1e3:.2f} ms (speedup {tj/tp:.2f}x)")


if __name__ == "__main__":
    main()
