"""HTTP serving daemon (``vae_connexe_tpu/server.py``).

Pins: health/meta endpoints, npy and json generation responses matching
the in-process artifact call per seed, request stats, and error paths.
The daemon completes the deployment story the reference lacks entirely
(SURVEY.md §5: its "serving" is re-running a notebook cell).
"""

import io
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.server import GeneratorServer
from vae_connexe_tpu.serving import export_generator, load_generator


@pytest.fixture(scope="module")
def server():
    p = 4
    model, err = CRVAE(p=p, hidden=16), ErrorVAE(d=p, hidden=16)
    blob = export_generator(model, err, model.init(jax.random.key(0)),
                            err.init(jax.random.key(1)), batch=6)
    srv = GeneratorServer(blob)          # port=0: auto-pick
    srv.start()
    yield srv, blob
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(
            f"http://{srv.host}:{srv.port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(srv, path, body: dict):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=60)


def test_healthz_and_meta(server):
    srv, _ = server
    status, body = _get(srv, "/healthz")
    assert status == 200 and body == {"ok": True}
    status, meta = _get(srv, "/meta")
    assert status == 200
    assert meta["kind"] == "crvae_compensated_generator"
    assert meta["batch"] == 6 and meta["warmup_s"] > 0


def test_generate_npy_matches_artifact(server):
    srv, blob = server
    with _post(srv, "/generate", {"seed": 5}) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-npy"
        samples = np.load(io.BytesIO(r.read()))
    fn, _ = load_generator(blob)
    np.testing.assert_array_equal(samples, fn(5))


def test_generate_json_and_stats(server):
    srv, _ = server
    with _post(srv, "/generate", {"seed": 1, "format": "json"}) as r:
        body = json.loads(r.read())
    arr = np.asarray(body["samples"], np.float32)
    assert list(arr.shape) == body["shape"]
    assert np.isfinite(arr).all()
    _, meta = _get(srv, "/meta")
    assert meta["requests"] >= 2
    assert meta["mean_generate_ms"] > 0


def test_error_paths(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/generate", {"format": "protobuf"})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/nope", {})
    assert ei.value.code == 404
    status = None
    try:
        _get(srv, "/nothing")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404
