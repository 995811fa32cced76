"""AOT serving export (infer/export.py): artifact roundtrip parity with the
live model, bucketed ragged serving, exact-shape API contracts, and the
deployment guarantee — separation through the artifact without importing any
model module."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from amss_tpu.infer.export import ServingArtifact, export_serving
from amss_tpu.infer.streaming import BucketSpec, StreamingSeparator
from amss_tpu.models.tasnet import TasNetModel
from amss_tpu.utils.config import FrontConfig, ModelConfig, SeparatorConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg():
    return ModelConfig(
        kind="tasnet",
        front=FrontConfig(kind="adapt", n_filters=32, filter_len=16, stride=8, pool=1),
        sep=SeparatorConfig(
            hidden=24, layers=1, embed_dim=4, trunk="tcn", blocks=2, repeats=1
        ),
        nb_speakers=2,
    )


def _waves(lengths, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(t).astype(np.float32) * 0.3 for t in lengths]


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model = TasNetModel(_tiny_cfg())
    params = model.init(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("exp") / "serving")
    export_serving(
        model, params, out, lengths=(1024, 4096), batch=4, platforms=("cpu",)
    )
    return model, params, out


def test_artifact_files(artifact):
    _, _, out = artifact
    names = sorted(os.listdir(out))
    assert "export_meta.json" in names and "params.msgpack" in names
    assert "serving_t1024_b4.jaxexp" in names
    assert "serving_t4096_b4.jaxexp" in names
    meta = json.load(open(os.path.join(out, "export_meta.json")))
    assert meta["n_speakers"] == 2 and meta["batch"] == 4
    assert [b["length"] for b in meta["buckets"]] == [1024, 4096]


def test_roundtrip_parity_with_live_model(artifact):
    """Artifact output == StreamingSeparator output on the same ragged corpus
    (same program, same padding/frame-mask semantics)."""
    model, params, out = artifact
    waves = _waves([900, 1024, 2000, 4096, 3000])
    live = StreamingSeparator(
        model, params, buckets=BucketSpec(lengths=(1024, 4096))
    ).separate_all(waves, max_batch=4)
    art = ServingArtifact(out)
    got = art.separate_all(waves)
    assert art.meter.utterances == len(waves)
    for g, l, w in zip(got, live, waves):
        assert g.shape == (2, len(w)) == l.shape
        np.testing.assert_allclose(g, l, atol=2e-5)


def test_exact_batch_api(artifact):
    model, params, out = artifact
    art = ServingArtifact(out)
    mix = np.stack(_waves([1024] * 4))
    est = art.separate_batch(mix)
    assert est.shape == (4, 2, 1024)
    with pytest.raises(ValueError, match="exact-shape"):
        art.separate_batch(mix[:, :512])
    with pytest.raises(ValueError, match="largest exported bucket"):
        art.separate_batch(np.stack(_waves([9000] * 4)))


def test_long_form_through_artifact(artifact):
    """Over-bucket utterances route through the artifact's chunked
    overlap-discard path and match the live-model long path exactly (same
    per-chunk program + the shared stitch)."""
    from amss_tpu.infer.long import separate_long

    model, params, out = artifact
    art = ServingArtifact(out)
    wave = _waves([9000], seed=11)[0]
    got = art.separate_all([wave])[0]
    assert got.shape == (2, 9000)
    live = separate_long(model, params, wave, chunk=4096)
    np.testing.assert_allclose(got, live, atol=2e-5)
    assert art.meter.utterances == 1


def test_serving_without_model_code(artifact):
    """Deployment guarantee: a fresh process separates through the artifact
    with no amss_tpu.models/train/configs import (AOT — no tracing)."""
    _, _, out = artifact
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys, numpy as np
from amss_tpu.infer.export import ServingArtifact
art = ServingArtifact({out!r})
est = art.separate_all([np.zeros(700, np.float32), np.ones(1024, np.float32)])
assert est[0].shape == (2, 700) and est[1].shape == (2, 1024)
banned = [m for m in sys.modules
          if m.startswith(("amss_tpu.models", "amss_tpu.train",
                           "amss_tpu.configs"))]
assert not banned, banned
print("OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def _tiny_c7_model():
    import dataclasses

    from amss_tpu.configs.recipes import c7_realtime
    from amss_tpu.train.engine import make_model

    r = c7_realtime()
    sep = dataclasses.replace(r.model.sep, hidden=16, blocks=3, repeats=2)
    return make_model(dataclasses.replace(r.model, sep=sep))


@pytest.fixture(scope="module")
def rt_artifact(tmp_path_factory):
    from amss_tpu.infer.export import export_realtime

    model = _tiny_c7_model()
    params = model.init(jax.random.PRNGKey(1))
    out = str(tmp_path_factory.mktemp("exp_rt") / "rt")
    export_realtime(model, params, out, chunk_samples=1024, platforms=("cpu",))
    return model, params, out


def test_realtime_artifact_exact_vs_offline(rt_artifact):
    """The exported streaming loop reproduces offline separation exactly —
    the RealtimeSeparator contract survives AOT serialization."""
    from amss_tpu.infer.export import RealtimeArtifact

    model, params, out = rt_artifact
    art = RealtimeArtifact(out)
    wave = _waves([3000], seed=3)[0]
    got = art.separate_stream(wave)
    ref = np.asarray(model.separate(params, jax.numpy.asarray(wave[None])))[0]
    assert got.shape == ref.shape == (2, 3000)
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # push API: state persists across pushes; reset starts a new stream
    art.reset()
    o1 = art.push(wave[:1024])
    assert o1.shape == (2, 1024)
    with pytest.raises(ValueError, match="push expects"):
        art.push(wave[:512])


def test_artifact_kind_guards(rt_artifact, artifact):
    from amss_tpu.infer.export import RealtimeArtifact, ServingArtifact

    _, _, rt_dir = rt_artifact
    _, _, off_dir = artifact
    with pytest.raises(ValueError, match="RealtimeArtifact"):
        ServingArtifact(rt_dir)
    with pytest.raises(ValueError, match="ServingArtifact"):
        RealtimeArtifact(off_dir)


def test_realtime_artifact_multistream_ragged(rt_artifact):
    """A multi-stream artifact serves ragged wave groups per-slot-exactly
    (per-stream end_frame); outputs match offline separation."""
    from amss_tpu.infer.export import RealtimeArtifact, export_realtime

    model, params, _ = rt_artifact
    import tempfile

    out = tempfile.mkdtemp(prefix="rt2_")
    export_realtime(model, params, out, chunk_samples=1024, n_streams=2,
                    platforms=("cpu",))
    art = RealtimeArtifact(out)
    waves = _waves([2000, 1300], seed=7)
    got = art.separate_streams(waves)
    for g, w in zip(got, waves):
        ref = np.asarray(
            model.separate(params, jax.numpy.asarray(w[None]))
        )[0]
        assert g.shape == ref.shape == (2, len(w))
        np.testing.assert_allclose(g, ref, atol=1e-4)
    # short group: one wave into a 2-slot artifact
    solo = art.separate_streams(waves[:1])
    np.testing.assert_allclose(solo[0], got[0], atol=1e-5)
    with pytest.raises(ValueError, match="separate_stream serves one"):
        art.separate_stream(waves[0])
