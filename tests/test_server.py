"""HTTP serving daemon (infer/server.py): offline /separate and realtime
/stream endpoints against live in-process servers; responses must equal
direct artifact calls."""

import base64
import http.client
import json
import threading

import jax
import numpy as np
import pytest

from amss_tpu.infer.server import (
    SeparationServer,
    wav_bytes_decode,
    wav_bytes_encode,
)


def _spawn(artifact_dir):
    srv = SeparationServer(artifact_dir, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


def _post(port, path, body, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body, headers=headers or {})
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_wav_bytes_roundtrip():
    x = np.linspace(-0.5, 0.5, 777).astype(np.float32)
    y, sr = wav_bytes_decode(wav_bytes_encode(x, 8000))
    assert sr == 8000
    np.testing.assert_allclose(y, x, atol=1 / 32767.0)


@pytest.fixture(scope="module")
def offline_server(tmp_path_factory):
    from amss_tpu.infer.export import ServingArtifact, export_serving
    from amss_tpu.models.tasnet import TasNetModel

    from test_export import _tiny_cfg

    model = TasNetModel(_tiny_cfg())
    params = model.init(jax.random.PRNGKey(0))
    d = str(tmp_path_factory.mktemp("srv") / "art")
    export_serving(model, params, d, lengths=(2048,), batch=2,
                   platforms=("cpu",))
    srv = _spawn(d)
    yield srv, ServingArtifact(d)
    srv.shutdown()


def test_healthz_and_separate(offline_server):
    srv, art = offline_server
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
    conn.request("GET", "/healthz")
    h = json.loads(conn.getresponse().read())
    conn.close()
    assert h == {"status": "ok", "kind": "offline", "n_speakers": 2,
                 "sample_rate": 8000}

    wave = (np.random.default_rng(0).standard_normal(1500) * 0.3).astype(
        np.float32
    )
    status, data = _post(srv.port, "/separate",
                         wav_bytes_encode(wave, 8000))
    assert status == 200, data
    rep = json.loads(data)
    assert len(rep["speakers"]) == 2
    # int16 WAV quantization (and PCM full-scale clipping — this random-init
    # model overshoots [-1, 1]) are the only differences vs the direct call
    direct = art.separate_all([wav_bytes_decode(
        wav_bytes_encode(wave, 8000))[0]])[0]
    for s in range(2):
        got, sr = wav_bytes_decode(base64.b64decode(rep["speakers"][s]))
        assert sr == 8000 and got.shape == (1500,)
        np.testing.assert_allclose(
            got, np.clip(direct[s], -1.0, 1.0), atol=2 / 32767.0
        )


def test_separate_rejects_wrong_rate_and_route(offline_server):
    srv, _ = offline_server
    wave = np.zeros(100, np.float32)
    status, data = _post(srv.port, "/separate", wav_bytes_encode(wave, 16000))
    assert status == 400 and b"16000" in data
    status, data = _post(srv.port, "/stream/push", b"\0" * 8)
    assert status == 400 and b"no route" in data


@pytest.fixture(scope="module")
def realtime_server(tmp_path_factory):
    from amss_tpu.infer.export import RealtimeArtifact, export_realtime

    from test_export import _tiny_c7_model

    model = _tiny_c7_model()
    params = model.init(jax.random.PRNGKey(1))
    d = str(tmp_path_factory.mktemp("srv_rt") / "art")
    export_realtime(model, params, d, chunk_samples=1024, platforms=("cpu",))
    srv = _spawn(d)
    yield srv, RealtimeArtifact(d), (model, params)
    srv.shutdown()


def test_stream_push_matches_offline(realtime_server):
    srv, art, (model, params) = realtime_server
    wave = (np.random.default_rng(5).standard_normal(2048) * 0.3).astype(
        np.float32
    )
    status, _ = _post(srv.port, "/stream/reset", b"")
    assert status == 200
    blocks = []
    padded = np.zeros(3 * 1024, np.float32)
    padded[:2048] = wave
    end = art.front.frames_for(2048)
    for i in range(3):
        status, data = _post(
            srv.port, "/stream/push",
            padded[i * 1024 : (i + 1) * 1024].tobytes(),
            headers={"X-End-Frame": str(end)},
        )
        assert status == 200, data
        blocks.append(np.frombuffer(data, np.float32).reshape(2, 1024))
    full = np.concatenate(blocks, axis=-1)[:, art.lag : art.lag + 2048]
    ref = np.asarray(model.separate(params, jax.numpy.asarray(wave[None])))[0]
    np.testing.assert_allclose(full, ref, atol=1e-4)

    # wrong chunk size -> 400
    status, data = _post(srv.port, "/stream/push", b"\0" * 16)
    assert status == 400 and b"float32" in data
