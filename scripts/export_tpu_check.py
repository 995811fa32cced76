"""Validate AOT serving artifacts on the REAL TPU (run when the tunnel is
up): exports the committed flagship + causal checkpoints with the default
("cpu", "tpu") lowering platforms, runs them through ServingArtifact /
RealtimeArtifact on the chip, and compares against the live jitted model.

This is the one assumption tests/test_export.py cannot cover from CPU: that
jax.export's "tpu" lowering platform actually matches the axon PJRT backend
at execution time.  Prints one JSON line per check.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amss_tpu.infer.export import (
        RealtimeArtifact,
        ServingArtifact,
        export_realtime,
        export_serving,
    )
    from amss_tpu.train.engine import load_model_from_run

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    # ---- offline artifact on the flagship ---------------------------------
    model, params = load_model_from_run(os.path.join(repo, "checkpoints",
                                                     "c6_flagship"))
    d = tempfile.mkdtemp(prefix="exp_tpu_")
    t = 16384
    export_serving(model, params, d, lengths=(t,), batch=4)
    art = ServingArtifact(d)
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(n).astype(np.float32) * 0.3
             for n in (t, t - 777, t // 2, t)]
    t0 = time.perf_counter()
    got = art.separate_all(waves)
    wall = time.perf_counter() - t0
    # live parity on the exact-shape row
    live = np.asarray(
        jax.jit(lambda p, m: model.separate(p, m))(params,
                                                   jnp.asarray(waves[0][None]))
    )[0]
    err = float(np.abs(got[0] - live).max())
    print(json.dumps({
        "check": "offline_artifact_tpu",
        "max_err_vs_live": err,
        "ok": err < 1e-2,  # chip tiling noise; exactness is pinned on CPU
        "compile_s": round(art.meter.compile_seconds, 2),
        "serve_s": round(wall - art.meter.compile_seconds, 3),
        "rtf": round(art.meter.rtf, 5),
    }), flush=True)

    # ---- realtime artifact on the causal flagship -------------------------
    model7, params7 = load_model_from_run(os.path.join(repo, "checkpoints",
                                                       "c7_causal"))
    d7 = tempfile.mkdtemp(prefix="exp_tpu_rt_")
    export_realtime(model7, params7, d7, chunk_samples=8192)
    art7 = RealtimeArtifact(d7)
    wave = rng.standard_normal(3 * 8192).astype(np.float32) * 0.3
    t0 = time.perf_counter()
    est = art7.separate_stream(wave)
    wall = time.perf_counter() - t0
    live7 = np.asarray(
        jax.jit(lambda p, m: model7.separate(p, m))(params7,
                                                    jnp.asarray(wave[None]))
    )[0]
    err7 = float(np.abs(est - live7).max())
    print(json.dumps({
        "check": "realtime_artifact_tpu",
        "max_err_vs_live": err7,
        "ok": err7 < 1e-2,
        "wall_s_3x1s_chunks": round(wall, 3),
    }), flush=True)
    print("EXPORT TPU CHECK DONE", flush=True)


if __name__ == "__main__":
    main()
