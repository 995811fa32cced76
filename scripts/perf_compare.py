"""Train-step / inference latency comparison on the real chip.

Variants: float32 vs bfloat16 BLSTM compute, pallas vs jnp front.  Prints one
line per variant.  Timing uses host fetches (axon block_until_ready is a
no-op — see memory/axon-async-sync).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timeit(fn, sync, iters=10):
    fn()  # warm/compile
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()
    return (time.perf_counter() - t0) / iters


def main():
    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.train.engine import make_model

    rng = np.random.default_rng(0)
    srcs = jnp.asarray(rng.standard_normal((16, 2, 16384)) * 0.3, jnp.float32)
    mix8 = jnp.asarray(rng.standard_normal((8, 64000)), jnp.float32)

    for dtype in ["float32", "bfloat16"]:
        for pallas in ["1", "0"]:
            os.environ["AMSS_PALLAS"] = pallas
            r = c1_stft_dpcl()
            mcfg = dataclasses.replace(
                r.model, sep=dataclasses.replace(r.model.sep, compute_dtype=dtype)
            )
            model = make_model(mcfg)
            params = model.init(jax.random.PRNGKey(0))
            tx = optax.adam(1e-3)
            opt = tx.init(params)

            @jax.jit
            def step(p, o):
                (l, _), g = jax.value_and_grad(model.loss_from_batch, has_aux=True)(
                    p, {"sources": srcs}
                )
                up, o = tx.update(g, o, p)
                return optax.apply_updates(p, up), o, l

            state = {"p": params, "o": opt}
            losses = []

            def run_step():
                state["p"], state["o"], l = step(state["p"], state["o"])
                losses.append(l)

            def sync():
                _ = float(losses[-1])

            st = timeit(run_step, sync)

            sep = jax.jit(lambda p, m: model.separate(p, m))
            out = {}

            def run_sep():
                out["e"] = sep(state["p"], mix8)

            def sync_sep():
                _ = np.asarray(out["e"][:, :, :4])

            it = timeit(run_sep, sync_sep)
            rtf = it / (8 * 8.0)
            print(
                f"dtype={dtype} pallas={pallas}: train_step={st*1000:.1f}ms "
                f"({16*2.048/st:.1f} audio-s/s)  separate_8x8s={it*1000:.1f}ms "
                f"rtf={rtf:.5f} loss={float(losses[-1]):.4f}",
                flush=True,
            )
    os.environ.pop("AMSS_PALLAS", None)


if __name__ == "__main__":
    main()
