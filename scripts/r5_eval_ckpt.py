"""Evaluate an arbitrary run-dir checkpoint (raw + ema arms) at n=200.

`python scripts/r5_eval_ckpt.py <run_dir> <stage_prefix> [n] [best]`

Safety valve for the round-5 chain: if wall-clock runs out mid-arm, the
latest checkpoint still gets the standard blind_eval rows (same v2test
protocol as every flagship row) instead of dying unevaluated.  Reads
config.json from the run dir, restores ckpt_best/ckpt_latest, and logs
`<stage_prefix>_{raw,ema}` rows with the checkpoint's step count.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3_wave import V2, blind_eval, log_result  # noqa: E402


def main():
    run_dir, prefix = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    best = len(sys.argv) > 4 and sys.argv[4] == "best"

    import jax
    import flax.serialization as fser

    from amss_tpu.ckpt.checkpoint import _split_raw
    from amss_tpu.utils.config import recipe_from_dict

    with open(os.path.join(run_dir, "config.json")) as f:
        recipe = recipe_from_dict(json.load(f))
    name = "ckpt_best.msgpack" if best else "ckpt_latest.msgpack"
    path = os.path.join(run_dir, name)
    if not os.path.exists(path):
        path = os.path.join(run_dir, "ckpt_latest.msgpack")
    with open(path, "rb") as f:
        raw, _ = _split_raw(fser.msgpack_restore(f.read()))
    step = int(raw.get("step", -1))

    from amss_tpu.train.engine import make_model

    model = make_model(recipe.model, base_run=recipe.base_run)
    # msgpack restores lists as str-keyed dicts — rebuild real pytrees
    # against a model-initialized template (load_model_from_run convention)
    tmpl = model.init(jax.random.PRNGKey(0))
    state = {"step": step,
             "params": fser.from_state_dict(tmpl, raw["params"])}
    if raw.get("ema_params") is not None:
        state["ema_params"] = fser.from_state_dict(tmpl, raw["ema_params"])
    for tag in ("raw", "ema"):
        p = state["params"] if tag == "raw" else state.get("ema_params")
        if p is None:
            continue
        out = blind_eval(model, p, V2, n=n)
        out.update(stage=f"{prefix}_{tag}", steps=step, run_dir=run_dir,
                   ckpt=os.path.basename(path))
        log_result(out)


if __name__ == "__main__":
    main()
