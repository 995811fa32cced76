"""A/B: int8-compressed serving weights vs float32, on the committed trained
flagship (checkpoints/c6_flagship) — the measured-quality row behind the
"int8 serving artifacts" PARITY.md entry.  Runs on CPU (inference only);
the v2test mixture convention (Mixer seed 0, test split) with bootstrap CIs.

Usage: python scripts/quantize_ab.py [ckpt_dir] [n] [cpu|axon]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

if (sys.argv[3] if len(sys.argv) > 3 else "cpu") == "cpu":
    # the axon sitecustomize force-sets jax_platforms; the env var is not
    # enough (verify skill gotcha) — without this, a down tunnel hangs us
    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "quality_results.jsonl")


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "checkpoints", "c6_flagship"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import flax.serialization as fser
    import jax

    from amss_tpu.infer.quantize import (
        dequantize_state_dict,
        quantize_state_dict,
        quantized_fraction,
    )
    from amss_tpu.train.engine import load_model_from_run

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from r3_wave import V2, blind_eval, ensure_corpora

    ensure_corpora()
    model, params = load_model_from_run(ckpt)
    sd = fser.to_state_dict(jax.tree_util.tree_map(np.asarray, params))
    q = quantize_state_dict(sd)
    params_q = fser.from_state_dict(params, dequantize_state_dict(q))

    for tag, p in [("f32", params), ("int8", params_q)]:
        t0 = time.time()
        out = blind_eval(model, p, V2, n=n)
        rec = {
            "stage": f"quant_ab_{tag}",
            "ckpt": os.path.relpath(ckpt, REPO),
            "n": n,
            "si_sdri": out["si_sdri"],
            "si_sdri_ci": out.get("si_sdri_ci"),
            "sdri": out.get("sdri"),
            "sdri_ci": out.get("sdri_ci"),
            "bytes_saved_frac": round(quantized_fraction(q), 4),
            "eval_seconds": round(time.time() - t0, 1),
            "platform": jax.devices()[0].platform,
            "time": time.time(),
        }
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
