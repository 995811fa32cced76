"""Int8 serving-artifact compression (infer/quantize.py).

Pins: (1) the encoding's per-channel error bound and leaf eligibility rules;
(2) artifact-path equivalence — an int8-exported ServingArtifact computes
EXACTLY what the live model computes with dequantize(quantize(params)), so
the only numerical effect is the one-time weight rounding; (3) the realtime
(causal streaming) artifact under the same compression; (4) the byte savings
are real on disk."""

import os

import jax
import numpy as np

from amss_tpu.infer.export import (
    RealtimeArtifact,
    ServingArtifact,
    export_realtime,
    export_serving,
)
from amss_tpu.infer.quantize import (
    dequantize_state_dict,
    quantize_state_dict,
    quantized_fraction,
)
from amss_tpu.models.tasnet import TasNetModel
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig


def _cfg(causal=False):
    return ModelConfig(
        kind="tasnet",
        front=FrontConfig(kind="adapt", n_filters=32, filter_len=16, stride=8, pool=1),
        sep=SeparatorConfig(
            hidden=24, layers=1, embed_dim=4, trunk="tcn", blocks=2, repeats=1,
            causal=causal,
            feature_norm="cumulative" if causal else "instance",
        ),
        nb_speakers=2,
    )


def test_leaf_error_bound_and_eligibility():
    rng = np.random.default_rng(0)
    sd = {
        "w": (rng.standard_normal((64, 48)) * 3.0).astype(np.float32),
        "outlier": np.concatenate(  # one huge column must not hurt the rest
            [rng.standard_normal((80, 15)), 100 * rng.standard_normal((80, 1))],
            axis=1,
        ).astype(np.float32),
        "bias": rng.standard_normal(128).astype(np.float32),  # 1-D: skipped
        "tiny": rng.standard_normal((4, 4)).astype(np.float32),  # small: skipped
        "step": np.int32(7),
    }
    q = quantize_state_dict(sd, min_size=512)
    d = dequantize_state_dict(q)
    for name in ("w", "outlier"):
        col_max = np.max(np.abs(sd[name]), axis=0)
        # symmetric round-to-nearest: |err| <= scale/2 = col_max/254 per entry
        assert np.all(np.abs(d[name] - sd[name]) <= col_max / 254.0 + 1e-7), name
    assert d["bias"] is sd["bias"] and d["tiny"] is sd["tiny"]
    assert d["step"] == 7
    assert 0.6 < quantized_fraction(q) < 0.76  # most bytes eliminated


def test_quantize_idempotent_on_roundtrip():
    rng = np.random.default_rng(1)
    sd = {"w": rng.standard_normal((64, 64)).astype(np.float32)}
    once = dequantize_state_dict(quantize_state_dict(sd, min_size=1))
    twice = dequantize_state_dict(quantize_state_dict(once, min_size=1))
    np.testing.assert_array_equal(once["w"], twice["w"])


def test_serving_artifact_int8_exact_vs_dequantized_live(tmp_path):
    import flax.serialization as fser

    model = TasNetModel(_cfg())
    params = model.init(jax.random.PRNGKey(0))
    out = str(tmp_path / "q8")
    export_serving(
        model, params, out, lengths=(1024,), batch=2, platforms=("cpu",),
        quantize="int8",
    )
    ref = str(tmp_path / "f32")
    export_serving(model, params, ref, lengths=(1024,), batch=2, platforms=("cpu",))
    assert (
        os.path.getsize(os.path.join(out, "params.msgpack"))
        < 0.5 * os.path.getsize(os.path.join(ref, "params.msgpack"))
    )

    art = ServingArtifact(out)
    assert art.meta["params_quantize"] == "int8"
    rng = np.random.default_rng(2)
    waves = [rng.standard_normal(t).astype(np.float32) * 0.3 for t in (1000, 700)]
    got = art.separate_all(waves)

    # the live model on dequantize(quantize(params)) — must match EXACTLY
    sd = fser.to_state_dict(jax.tree_util.tree_map(np.asarray, params))
    dq = fser.from_state_dict(params, dequantize_state_dict(quantize_state_dict(sd)))
    live = ServingArtifact(ref)  # reuse the f32 program with dq params
    live.params = fser.to_state_dict(jax.tree_util.tree_map(np.asarray, dq))
    want = live.separate_all(waves)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6)

    # and the rounding itself is mild: int8 output stays close to f32 output
    f32 = ServingArtifact(ref)
    base = f32.separate_all(waves)
    for g, b in zip(got, base):
        err = np.linalg.norm(g - b) / (np.linalg.norm(b) + 1e-9)
        assert err < 0.15, err


def test_realtime_artifact_int8(tmp_path):
    model = TasNetModel(_cfg(causal=True))
    params = model.init(jax.random.PRNGKey(0))
    out = str(tmp_path / "rt_q8")
    export_realtime(
        model, params, out, chunk_samples=256, platforms=("cpu",),
        quantize="int8",
    )
    art = RealtimeArtifact(out)
    assert art.meta["params_quantize"] == "int8"
    rng = np.random.default_rng(3)
    wave = rng.standard_normal(1024).astype(np.float32) * 0.3
    est = art.separate_stream(wave)
    assert est.shape == (2, 1024)
    assert np.all(np.isfinite(est)) and float(np.abs(est).max()) > 0
