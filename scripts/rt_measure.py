"""Quick realtime-serving measurement on the chip (VERDICT r2 items 1b/2).

Times the c7 causal flagship through RealtimeSeparator in the three serving
shapes (sync push / pipelined / 16 concurrent streams) plus the tunnel
round-trip, printing one JSON line per shape.  Fast to iterate on — bench.py
runs the same paths inside the full headline run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    from amss_tpu.infer.realtime import RealtimeSeparator
    from amss_tpu.train.engine import load_model_from_run

    model, params = load_model_from_run(os.path.join(REPO, "checkpoints", "c7_causal"))
    rng = np.random.default_rng(0)
    c = 8192
    waves = [rng.standard_normal(c).astype(np.float32) * 0.3 for _ in range(16)]

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"tunnel_roundtrip_ms": round(1000 * float(np.median(ts)), 2)}),
          flush=True)

    # sync single stream
    rt = RealtimeSeparator(model, params, chunk_samples=c)
    for i in range(16):
        rt.push(waves[i % 16])
    print(json.dumps({"shape": "sync_1stream", "rtf": round(rt.rtf, 5),
                      "push_ms": round(1000 * rt.compute_seconds / max(rt._timed_pushes, 1), 2)}),
          flush=True)

    # pipelined single stream
    rt.reset()
    rt.compute_seconds = 0.0
    rt._timed_pushes = 0
    for i in range(16):
        rt.push_async(waves[i % 16])
    rt.flush()
    print(json.dumps({"shape": "pipelined_1stream", "rtf": round(rt.rtf, 5)}),
          flush=True)

    # 16 concurrent streams
    rt16 = RealtimeSeparator(model, params, chunk_samples=c, n_streams=16)
    batch = np.stack(waves)
    for _ in range(8):
        rt16.push(batch)
    print(json.dumps({"shape": "sync_16streams", "rtf_per_stream": round(rt16.rtf, 5),
                      "push_ms": round(1000 * rt16.compute_seconds / max(rt16._timed_pushes, 1), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
