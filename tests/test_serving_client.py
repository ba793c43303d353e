"""SaliencyClient against live servers (serving/client.py)."""

import io
import threading

import numpy as np
import pytest
import jax

from cp360_tpu.config import Config
from cp360_tpu.models.resnet import init_resnet_params
from cp360_tpu.serving.client import SaliencyClient, ServerError
from cp360_tpu.serving.server import SaliencyModel, serve

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def temporal_server():
    from cp360_tpu.models.clstm import init_clstm_params

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, seq_len=3,
                 compute_dtype="float32", serve_max_batch=2)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18", num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)
    model = SaliencyModel(params, cfg, arch="resnet18", clstm_params=clstm)
    httpd = serve(model, host="127.0.0.1", port=0, warmup=True)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield port, model
    httpd.shutdown()


def _rgb(seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(100, 200, 3) * 255).astype(np.uint8)


def test_client_health_and_saliency(temporal_server):
    port, model = temporal_server
    c = SaliencyClient(port=port)
    info = c.health()
    assert info["status"] == "ok" and info["temporal"]

    frame = _rgb(1)
    sal = c.saliency(frame)
    assert sal.shape == (4, 8) and sal.dtype == np.float32
    # the client's ndarray path is lossless PNG: equals the direct model
    want = np.asarray(model.predict(frame), np.float32)
    np.testing.assert_allclose(sal, want, rtol=1e-6, atol=1e-6)

    # pre-encoded bytes pass through unchanged
    buf = io.BytesIO()
    Image.fromarray(frame, "RGB").save(buf, "PNG")
    np.testing.assert_allclose(c.saliency(buf.getvalue()), want,
                               rtol=1e-6, atol=1e-6)

    png = c.saliency_png(frame)
    img = Image.open(io.BytesIO(png))
    assert img.size == (8, 4) and img.mode == "L"


def test_client_temporal_session(temporal_server):
    port, model = temporal_server
    c = SaliencyClient(port=port)
    frames = [_rgb(s) for s in range(4)]
    with c.temporal_session() as s:
        outs = [s.push(f) for f in frames]
    assert outs[0] is None and outs[1] is None  # seq_len=3 buffers two
    for sal in outs[2:]:
        assert sal.shape == (4, 8) and np.isfinite(sal).all()
    assert s.closed
    # pushing on a closed session is a clean 404 ServerError
    with pytest.raises(ServerError) as ei:
        s._c._json("POST", f"/temporal/frame?session={s.session_id}",
                   b"", retryable=False)
    assert ei.value.status in (400, 404)


def test_client_errors(temporal_server):
    port, _ = temporal_server
    c = SaliencyClient(port=port, retries=0)
    with pytest.raises(ServerError) as ei:
        c.saliency(b"not an image")
    assert ei.value.status == 400
    with pytest.raises(ValueError):
        c.saliency(np.zeros((4, 4), np.float32))  # wrong shape/dtype
    # connection-level failure surfaces after retries
    dead = SaliencyClient(port=1, retries=0, timeout_s=2)
    with pytest.raises((ServerError, OSError)):
        dead.health()


def test_client_retries_504(monkeypatch):
    """A 504 (device step timed out, no state mutated) is retried and the
    retry succeeds once the device worker unwedges."""
    # generous margins: with the 1.0 s timeout this test raced real compute
    # on a contended 1-core host (the retry 504'd on honest slowness, not
    # the wedge) — the wedge is what's under test, so give compute room
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64,
                 compute_dtype="float32", serve_max_batch=2,
                 serve_request_timeout_s=4.0)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    model = SaliencyModel(params, cfg, arch="resnet18")
    httpd = serve(model, host="127.0.0.1", port=0, warmup=True)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        stall = threading.Event()
        real_run = model._batcher._run_batch

        calls = []

        def wedged(items):
            if not calls:
                calls.append(1)
                stall.wait(30.0)  # first batch wedges past the 4 s timeout
            return real_run(items)

        monkeypatch.setattr(model._batcher, "_run_batch", wedged)
        c = SaliencyClient(port=port, retries=3, retry_backoff_s=0.5)
        t = threading.Timer(5.0, stall.set)  # unwedge before the retry
        t.start()
        sal = c.saliency(_rgb(7))
        t.join()
        assert sal.shape == (4, 8)
        assert calls  # the wedge really happened; the result came via retry
    finally:
        stall.set()
        httpd.shutdown()
        model._batcher.close()


def test_client_close_is_idempotent_and_swallows_404(temporal_server):
    """close() twice is a local no-op; closing a session the server no
    longer knows (first close committed, response lost, caller retried via
    a fresh handle) treats the 404 as already-closed instead of raising."""
    from cp360_tpu.serving.client import TemporalSession

    port, _ = temporal_server
    c = SaliencyClient(port=port)
    s = c.temporal_session()
    s.close()
    assert s.closed
    s.close()  # second close: no request, no error

    stale = TemporalSession(c, s.session_id)
    stale.close()  # server 404s; the client swallows it
    assert stale.closed
