"""HTTP serving layer driven through a real socket."""

import http.client
import io
import json
import threading

import numpy as np
import pytest
import jax

from cp360_tpu.config import Config
from cp360_tpu.models.resnet import init_resnet_params
from cp360_tpu.serving.server import SaliencyModel, serve

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def server():
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, compute_dtype="float32")
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    model = SaliencyModel(params, cfg, arch="resnet18")
    httpd = serve(model, host="127.0.0.1", port=0, warmup=True)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield port
    httpd.shutdown()


def _post(port, path, body, ctype="image/jpeg"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body, headers={"Content-Type": ctype})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def _frame_bytes():
    rng = np.random.RandomState(0)
    img = Image.fromarray((rng.rand(100, 200, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    return buf.getvalue()


def test_healthz(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    info = json.loads(resp.read())
    assert resp.status == 200 and info["status"] == "ok"
    assert info["arch"] == "resnet18" and info["frame_hw"] == [128, 256]


def test_saliency_json(server):
    status, ctype, data = _post(server, "/saliency", _frame_bytes())
    assert status == 200 and ctype == "application/json"
    out = json.loads(data)
    assert out["shape"] == [4, 8]  # 64px faces -> 2x2 feats -> 4x8 equi
    arr = np.asarray(out["saliency"])
    assert arr.shape == (4, 8) and np.isfinite(arr).all()


def test_saliency_png(server):
    status, ctype, data = _post(server, "/saliency?format=png", _frame_bytes())
    assert status == 200 and ctype == "image/png"
    img = Image.open(io.BytesIO(data))
    assert img.size == (8, 4) and img.mode == "L"


def test_bad_image_400(server):
    status, _, data = _post(server, "/saliency", b"this is not an image")
    assert status == 400
    assert "bad image" in json.loads(data)["error"]


def test_unknown_route_404(server):
    status, _, _ = _post(server, "/nope", b"")
    assert status == 404
