"""HTTP serving layer driven through a real socket."""

import http.client
import io
import json
import threading
import time

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
    # serve_max_batch=2 keeps warmup to two bucket compiles in CI; the
    # batching-specific tests below build their own models
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, compute_dtype="float32",
                 serve_max_batch=2)
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


# ---- temporal streaming sessions ------------------------------------------


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


def _frames(n, seed=3):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        img = Image.fromarray((rng.rand(100, 200, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "PNG")  # lossless so the equivalence check below is exact
        out.append((np.asarray(img, np.uint8), buf.getvalue()))
    return out


def test_temporal_streaming_session(temporal_server):
    port, model = temporal_server
    status, _, data = _post(port, "/temporal/session", b"")
    assert status == 200
    sid = json.loads(data)["session"]

    frames = _frames(4)
    preds = {}
    for i, (_, fb) in enumerate(frames):
        status, _, data = _post(port, f"/temporal/frame?session={sid}", fb)
        assert status == 200
        out = json.loads(data)
        assert out["frame"] == i
        if i < 2:  # seq_len=3: first two frames buffer
            assert out["pending"] == 2 - i and "saliency" not in out
        else:
            preds[i] = np.asarray(out["saliency"])
            assert preds[i].shape == (4, 8) and np.isfinite(preds[i]).all()

    # equivalence with the offline window protocol: prediction for frame i
    # == window_infer over the stage-1 cubes of frames [i-2 .. i]
    import jax.numpy as jnp

    from cp360_tpu.pipelines.temporal import window_infer

    cubes = [model._stage1(arr)[0] for arr, _ in frames]
    for i in (2, 3):
        window = jnp.stack(cubes[i - 2:i + 1])[None]
        want = np.asarray(window_infer(
            model.clstm_params, window, compute_dtype=jnp.float32))[0]
        np.testing.assert_allclose(preds[i], want, rtol=1e-6, atol=1e-6)

    status, _, data = _post(port, f"/temporal/close?session={sid}", b"")
    assert status == 200 and json.loads(data)["closed"]
    # closed session is gone
    status, _, _ = _post(port, f"/temporal/frame?session={sid}", frames[0][1])
    assert status == 404


def test_temporal_unknown_session_404(temporal_server):
    port, _ = temporal_server
    status, _, _ = _post(port, "/temporal/frame?session=nope", _frame_bytes())
    assert status == 404
    status, _, _ = _post(port, "/temporal/close?session=nope", b"")
    assert status == 404


def test_temporal_disabled_on_plain_server(server):
    status, _, data = _post(server, "/temporal/session", b"")
    assert status == 404
    assert "ConvLSTM" in json.loads(data)["error"]


def test_temporal_healthz(temporal_server):
    port, _ = temporal_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/healthz")
    info = json.loads(conn.getresponse().read())
    assert info["temporal"] is True and info["seq_len"] == 3


def test_idle_sessions_evicted(temporal_server, monkeypatch):
    """Abandoned sessions (no /temporal/close) are evicted after the idle
    TTL instead of permanently pinning the MAX_SESSIONS cap."""
    import cp360_tpu.serving.server as srv

    _, model = temporal_server
    sid = model.temporal_start()
    assert sid in model._sessions
    # age the session past the TTL and trigger the sweep via a new start
    model._sessions[sid]["last_used"] -= srv.SESSION_IDLE_TTL_S + 1
    sid2 = model.temporal_start()
    assert sid not in model._sessions
    assert sid2 in model._sessions
    model.temporal_close(sid2)


# ---- dynamic request batching ----------------------------------------------


def test_bucket_size():
    from cp360_tpu.serving.batcher import bucket_size

    assert [bucket_size(n, 8) for n in (1, 2, 3, 4, 5, 8, 9)] == [1, 2, 4, 4, 8, 8, 8]
    assert bucket_size(5, 6) == 6 and bucket_size(7, 6) == 6
    assert bucket_size(3, 1) == 1


def test_batcher_groups_and_orders():
    from cp360_tpu.serving.batcher import DynamicBatcher

    calls = []

    def run(items):
        calls.append(list(items))
        return [x * 10 for x in items]

    b = DynamicBatcher(run, max_batch=4, window_ms=2000.0, name="t")
    assert b.submit(1) == 10  # singleton passes straight through

    # 5 concurrent submitters: the 2 s window dwarfs thread-start skew, so
    # the worker groups them into a full batch of 4 plus a remainder
    results = {}

    def worker(i):
        results[i] = b.submit(i)

    ths = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert results == {i: i * 10 for i in range(5)}
    assert len(calls) <= 3  # warm single + at most 2 groups
    assert b.stats["items"] == 6 and b.stats["max_group"] >= 2
    assert all(len(c) <= 4 for c in calls)
    b.close()


def test_batcher_error_propagates_and_close_rejects():
    from cp360_tpu.serving.batcher import DynamicBatcher

    def run(items):
        raise ValueError("boom")

    b = DynamicBatcher(run, max_batch=2, window_ms=1.0)
    with pytest.raises(ValueError, match="boom"):
        b.submit(1)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(2)


def test_batcher_submit_racing_close_errors_not_hangs():
    """A submit that enqueues between close()'s drain and worker exit must
    raise, not block forever on a slot nothing will ever serve."""
    from cp360_tpu.serving.batcher import DynamicBatcher

    b = DynamicBatcher(lambda xs: list(xs), max_batch=2, window_ms=1.0)
    release = threading.Event()
    orig_put = b._q.put

    def race_put(obj):
        if isinstance(obj, tuple):  # the submit's (item, slot); close()'s
            release.wait(10)        # sentinel passes straight through
        return orig_put(obj)

    b._q.put = race_put
    errs = []

    def sub():
        try:
            b.submit(1)
        except RuntimeError as e:
            errs.append(e)

    t = threading.Thread(target=sub)
    t.start()  # passes the _closed check, then its put stalls on `release`
    b.close()
    release.set()
    t.join(10)
    assert not t.is_alive()
    assert errs and "closed" in str(errs[0])


def test_server_500_on_internal_error():
    """An unexpected failure inside predict() must answer 500 JSON, not
    drop the connection."""
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64,
                 compute_dtype="float32", serve_max_batch=1)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    model = SaliencyModel(params, cfg, arch="resnet18")
    model._batcher.close()  # every submit now fails deterministically
    httpd = serve(model, host="127.0.0.1", port=0, warmup=False)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        status, ctype, data = _post(port, "/saliency", _frame_bytes())
        assert status == 500 and ctype == "application/json"
        assert "closed" in json.loads(data)["error"]
    finally:
        httpd.shutdown()


def test_batched_predictions_match_serial():
    """Concurrent predict() calls coalesce into one padded device step and
    return exactly what each request would get alone."""
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, compute_dtype="float32",
                 serve_max_batch=4, serve_batch_window_ms=500.0)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    model = SaliencyModel(params, cfg, arch="resnet18")
    rng = np.random.RandomState(7)
    frames = [(rng.rand(128, 256, 3) * 255).astype(np.uint8) for _ in range(3)]

    serial = [model.predict(f) for f in frames]  # each runs as a batch of 1

    out = [None] * len(frames)

    def worker(i):
        out[i] = model.predict(frames[i])

    ths = [threading.Thread(target=worker, args=(i,)) for i in range(len(frames))]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    for a, b in zip(serial, out):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
    assert model._batcher.stats["max_group"] >= 2  # grouping actually happened
    model._batcher.close()


def test_concurrent_temporal_sessions_match_serial():
    """Concurrent sessions coalesce their window inferences into one padded
    ConvLSTM dispatch and still get exactly their own predictions."""
    from cp360_tpu.models.clstm import init_clstm_params

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, seq_len=3,
                 compute_dtype="float32", serve_max_batch=4,
                 serve_batch_window_ms=500.0)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18", num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)
    model = SaliencyModel(params, cfg, arch="resnet18", clstm_params=clstm)

    rng = np.random.RandomState(11)
    per_session = [
        [(rng.rand(128, 256, 3) * 255).astype(np.uint8) for _ in range(4)]
        for _ in range(3)
    ]

    def run_session(frames):
        sid = model.temporal_start()
        preds = {}
        for i, f in enumerate(frames):
            idx, sal = model.temporal_push(sid, f)
            assert idx == i
            if sal is not None:
                preds[i] = sal
        model.temporal_close(sid)
        return preds

    serial = [run_session(frames) for frames in per_session]

    results = [None] * len(per_session)

    def worker(i):
        results[i] = run_session(per_session[i])

    ths = [threading.Thread(target=worker, args=(i,)) for i in range(len(per_session))]
    for t in ths:
        t.start()
    for t in ths:
        t.join()

    for want, got in zip(serial, results):
        assert sorted(want) == sorted(got) == [2, 3]
        for k in want:
            # grouped requests run at different batch sizes than the serial
            # singletons, so XLA's conv reassociation differs at f32 noise
            # level (measured ~1e-5 on [0,1]-scale maps)
            np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=5e-5)
    # the concurrent phase actually grouped window inferences
    assert model._temporal_batcher.stats["max_group"] >= 2
    model._batcher.close()
    model._temporal_batcher.close()


def test_submit_timeout_on_stalled_worker():
    """submit(timeout_s=...) raises TimeoutError while a wedged run_batch
    holds the worker — requests must not hang with the device."""
    from cp360_tpu.serving.batcher import DynamicBatcher

    release = threading.Event()

    def slow_batch(items):
        release.wait(20.0)
        return items

    b = DynamicBatcher(slow_batch, max_batch=2, window_ms=1.0)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="timed out"):
        b.submit("x", timeout_s=0.8)
    assert time.monotonic() - t0 < 5.0
    assert b.stats["timeouts"] == 1 and b.busy_for_s() > 0.5
    release.set()  # un-wedge so close() can join the worker
    b.close()


def test_server_504_on_request_timeout():
    """serve_request_timeout_s answers 504 JSON instead of hanging when the
    device worker is stalled."""
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, compute_dtype="float32",
                 serve_max_batch=1, serve_request_timeout_s=0.8)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    model = SaliencyModel(params, cfg, arch="resnet18")
    model.warmup()
    stall = threading.Event()
    orig = model._batcher._run_batch

    def wedged(items):
        stall.wait(20.0)
        return orig(items)

    model._batcher._run_batch = wedged
    httpd = serve(model, host="127.0.0.1", port=0, warmup=False)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        status, ctype, data = _post(port, "/saliency", _frame_bytes())
        assert status == 504 and ctype == "application/json"
        assert "timed out" in json.loads(data)["error"]
    finally:
        stall.set()
        httpd.shutdown()
        model._batcher.close()


def test_metrics_endpoint(server):
    # generate one request, then scrape.  Counters increment in the
    # handler's finally, AFTER the response bytes are flushed, so a scrape
    # can race the accounting of any request it just observed (including a
    # previous scrape of itself) — the contract is that a LATER scrape sees
    # it; poll briefly for each expected line.
    _post(server, "/saliency", _frame_bytes())

    def scrape():
        conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/plain")
        return resp.read().decode()

    wanted = [
        'cp360_requests_total{route="saliency",code="200"}',
        'cp360_request_seconds_count{route="saliency"}',
        'cp360_batcher_items_total{batcher="stage1"}',
        "cp360_uptime_seconds",
        'route="metrics"',  # the first scrape itself, on a later scrape
    ]
    deadline = time.time() + 10.0
    text = scrape()
    while missing := [w for w in wanted if w not in text]:
        assert time.time() < deadline, (missing, text)
        time.sleep(0.05)
        text = scrape()


def test_data_parallel_serving_matches_single_device():
    """mesh_data > 1 shards the fused batch steps over local devices; every
    prediction (stage-1 and temporal) matches the single-device model."""
    from cp360_tpu.models.clstm import init_clstm_params

    n_dev = min(4, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs >=2 devices")
    kw = dict(equi_h=256, equi_w=128, cube_dim=64, seq_len=3,
              compute_dtype="float32", serve_max_batch=4,
              serve_batch_window_ms=200.0)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18", num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)
    ref = SaliencyModel(params, Config(**kw), arch="resnet18", clstm_params=clstm)
    dp = SaliencyModel(params, Config(mesh_data=n_dev, **kw), arch="resnet18",
                       clstm_params=clstm)
    assert dp.mesh is not None and dp.mesh.shape["data"] == n_dev
    # dp buckets are multiples of the data-axis size
    assert dp._bucket(1, 4) == n_dev and dp._bucket(3, 4) == n_dev

    rng = np.random.RandomState(3)
    frames = [(rng.rand(128, 256, 3) * 255).astype(np.uint8) for _ in range(3)]
    for f in frames:
        # dp pads the singleton to a full n_dev bucket and shards it; the
        # math is the same conv graph, so only f32 reassociation noise
        np.testing.assert_allclose(dp.predict(f), ref.predict(f),
                                   rtol=1e-4, atol=5e-5)

    def run_session(model, frames):
        sid = model.temporal_start()
        preds = {}
        for i, f in enumerate(frames):
            idx, sal = model.temporal_push(sid, f)
            if sal is not None:
                preds[i] = sal
        model.temporal_close(sid)
        return preds

    want = run_session(ref, frames)
    got = run_session(dp, frames)
    assert sorted(want) == sorted(got) == [2]
    np.testing.assert_allclose(got[2], want[2], rtol=1e-4, atol=5e-5)
    for m in (ref, dp):
        m._batcher.close()
        m._temporal_batcher.close()


def test_healthz_reports_batching(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/healthz")
    info = json.loads(conn.getresponse().read())
    bat = info["batching"]
    assert bat["max_batch"] == 2 and bat["batches"] >= 1 and bat["items"] >= 1


def test_predict_yuv420_close_to_rgb8():
    """upload_format=yuv420 halves per-request H2D; predictions stay within
    the codec bound of the exact path (natural-spectrum frame)."""
    import cv2
    import numpy as np

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, compute_dtype="float32")
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    m_rgb = SaliencyModel(params, cfg, arch="resnet18")
    m_yuv = SaliencyModel(params, cfg.replace(upload_format="yuv420"),
                          arch="resnet18")
    rng = np.random.RandomState(3)
    img = np.zeros((128, 256))
    for scale in (4, 8, 16):
        small = rng.rand(128 // scale + 2, 256 // scale + 2)
        img += cv2.resize(small, (256, 128), interpolation=cv2.INTER_CUBIC) * scale
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.uint8)
    frame = np.stack([img, np.roll(img, 2, 0), np.roll(img, 5, 1)], -1)
    a = m_rgb.predict(frame)
    b = m_yuv.predict(frame)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.998
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.08


def test_serve_cli_sigterm_drains_cleanly(tmp_path):
    """cp360-serve under a process supervisor: SIGTERM stops accepting,
    finishes in-flight work, closes the batchers and exits 0."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, CP360_PLATFORM="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [sys.executable, "-m", "cp360_tpu.cli.serve", "--mode", "resnet18",
         "--port", str(port), "--set", "equi_h=256", "--set", "equi_w=128",
         "--set", "cube_dim=64", "--set", "compute_dtype=float32",
         "--set", "serve_max_batch=1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=str(tmp_path))
    try:
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5).read()
                break
            except Exception:
                if proc.poll() is not None:
                    raise AssertionError(f"server died: {proc.stdout.read()}")
                time.sleep(2)
        else:
            raise AssertionError("server never came up")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)
    assert proc.returncode == 0, out
    assert "shut down cleanly" in out


def test_warmup_bypasses_request_timeout():
    """First compiles take minutes; warmup() must not 504 itself even with
    an aggressive serve_request_timeout_s (crash-loop under a supervisor)."""
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, compute_dtype="float32",
                 serve_max_batch=1, serve_request_timeout_s=0.001)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    model = SaliencyModel(params, cfg, arch="resnet18")
    model.warmup()  # compile certainly exceeds 1 ms; must not raise
    assert model._warming is False and model._timeout_s() == 0.001
    model._batcher.close()


def test_sub_poll_interval_timeout_honored():
    """timeout_s below the 0.5 s liveness-poll interval fires on time."""
    from cp360_tpu.serving.batcher import DynamicBatcher

    release = threading.Event()
    b = DynamicBatcher(lambda items: (release.wait(20.0), items)[1],
                       max_batch=1, window_ms=0.0)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        b.submit("x", timeout_s=0.1)
    assert time.monotonic() - t0 < 0.45
    release.set()
    b.close()


def test_dp_max_batch_rounded_to_shard_multiple():
    """mesh_data that does not divide serve_max_batch: the cap rounds DOWN
    to a shard multiple so padded buckets never exceed the operator's
    configured device batch."""
    if len(jax.devices()) < 3:
        pytest.skip("needs >=3 devices")
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, compute_dtype="float32",
                 serve_max_batch=8, mesh_data=3)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    model = SaliencyModel(params, cfg, arch="resnet18")
    assert model._batcher.max_batch == 6
    assert model._bucket(1, 6) == 3 and model._bucket(5, 6) == 6
    assert max(model._bucket(n, 6) for n in range(1, 7)) <= 6
    model._batcher.close()


def test_temporal_504_leaves_session_retryable():
    """A timed-out window inference must not mutate the session: the client
    retries the SAME frame and gets the protocol-correct prediction."""
    from cp360_tpu.models.clstm import init_clstm_params

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, seq_len=2,
                 compute_dtype="float32", serve_max_batch=1,
                 serve_request_timeout_s=1.0)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18", num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)
    model = SaliencyModel(params, cfg, arch="resnet18", clstm_params=clstm)
    model.warmup()

    rng = np.random.RandomState(5)
    f0, f1 = [(rng.rand(128, 256, 3) * 255).astype(np.uint8) for _ in range(2)]
    sid = model.temporal_start()
    assert model.temporal_push(sid, f0) == (0, None)

    stall = threading.Event()
    orig = model._temporal_batcher._run_batch

    def wedged(windows):
        stall.wait(20.0)
        return orig(windows)

    model._temporal_batcher._run_batch = wedged
    with pytest.raises(TimeoutError):
        model.temporal_push(sid, f1)
    sess = model._sessions[sid]
    assert sess["count"] == 1 and len(sess["frames"]) == 1  # untouched
    stall.set()
    model._temporal_batcher._run_batch = orig
    idx, sal = model.temporal_push(sid, f1)  # retry the same frame
    assert idx == 1 and sal is not None and np.isfinite(sal).all()

    # clean-session reference: identical prediction for the same two frames
    sid2 = model.temporal_start()
    model.temporal_push(sid2, f0)
    _, want = model.temporal_push(sid2, f1)
    np.testing.assert_allclose(sal, want, rtol=1e-6, atol=1e-6)
    model._batcher.close()
    model._temporal_batcher.close()


def test_metrics_unknown_route_collapses(server):
    _post(server, "/wp-login.php", b"")
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/metrics")
    text = conn.getresponse().read().decode()
    assert 'cp360_requests_total{route="other",code="404"}' in text
    assert "wp-login" not in text


@pytest.mark.parametrize("arch,init", [
    ("mobilenet_v2", "init_mobilenet_v2_params"),
    ("vgg16", "init_vgg16_params"),
])
def test_serving_other_backbone_families(arch, init):
    """The server's arch dispatch covers every backbone family the
    extraction CLI supports — predict compiles and matches a direct call
    of the same fused stage-1 step outside the batcher."""
    import importlib

    from cp360_tpu.pipelines.extract import (
        host_faces_for_upload,
        stage1_batch_faces,
    )

    mod = importlib.import_module(
        f"cp360_tpu.models.{'mobilenet' if arch == 'mobilenet_v2' else 'vgg'}")
    params = getattr(mod, init)(jax.random.PRNGKey(0), num_classes=16)
    cfg = Config(equi_h=256, equi_w=128, cube_dim=64,
                 compute_dtype="float32", serve_max_batch=1)
    model = SaliencyModel(params, cfg, arch=arch)
    try:
        frame = (np.random.RandomState(1).rand(100, 200, 3) * 255).astype(np.uint8)
        sal = np.asarray(model.predict(frame))
        assert sal.shape == (4, 8) and np.isfinite(sal).all()

        # the same frame through the library step directly (the server feeds
        # the frame as-is — its prep is resize(LANCZOS) + cube remap, no
        # channel swap; see SaliencyModel._host_prep)
        from cp360_tpu.pipelines.extract import _resize_frame_pil

        frame_u8, _ = _resize_frame_pil(frame, (cfg.equi_h, cfg.equi_w))
        faces = host_faces_for_upload(frame_u8, cfg.cube_dim, False)
        import jax.numpy as jnp

        _, want = stage1_batch_faces(
            params, jnp.asarray(faces[None]), arch=arch,
            use_cube_pad=cfg.cube_pad, compute_dtype=jnp.float32)
        np.testing.assert_allclose(sal, np.asarray(want[0]), atol=1e-5)
    finally:
        model._batcher.close()
