"""Serving latency/throughput on the real chip, through a live socket.

Starts the HTTP server in-process (warmed), then measures:
  1. sequential `/saliency` latency (median/p90 per request, incl. JPEG
     decode + host remap + HTTP overhead) — the number PARITY quotes;
  2. the same with K concurrent clients — dynamic batching throughput
     (serving/batcher.py groups requests into fused padded steps);
  3. optionally (--temporal) K concurrent ConvLSTM streaming sessions —
     window inferences coalesce through the temporal batcher.

No reference analogue (the reference has no serving stack, SURVEY.md §2).

Usage: python tools/bench_serve.py [n_requests=24] [concurrency=4]
           [max_batch=4] [--temporal]
Prints one JSON line per phase.  max_batch bounds warmup cost: every
power-of-two bucket up to it is a separate remote compile (0.5–4 min each
through this host's helper — see CLAUDE.md).
"""

import io
import json
import http.client
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _post(port, path, body, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, body=body, headers={"Content-Type": "image/jpeg"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    assert resp.status == 200, (resp.status, data[:200])
    return data


def main():
    import jax

    if os.environ.get("BENCH_SERVE_PLATFORM"):
        # smoke-testing without the TPU tunnel: the JAX_PLATFORMS env var
        # is ignored under this host's sitecustomize (CLAUDE.md), config
        # update before any backend initializes is the working override
        jax.config.update("jax_platforms", os.environ["BENCH_SERVE_PLATFORM"])

    from PIL import Image

    from cp360_tpu.config import Config
    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.serving.server import SaliencyModel, serve

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_req = int(args[0]) if len(args) > 0 else 24
    conc = int(args[1]) if len(args) > 1 else 4
    max_batch = int(args[2]) if len(args) > 2 else 4
    temporal = "--temporal" in sys.argv

    cfg = Config(compute_dtype="bfloat16", upload_format="yuv420",
                 serve_max_batch=max_batch)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet50")
    clstm = None
    if temporal:
        from cp360_tpu.models.clstm import init_clstm_params

        clstm = init_clstm_params(jax.random.PRNGKey(1), 1000, 1000)
    model = SaliencyModel(params, cfg, arch="resnet50", clstm_params=clstm)
    t0 = time.time()
    httpd = serve(model, host="127.0.0.1", port=0, warmup=True)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    print(f"serve: warmup {time.time()-t0:.0f}s, port {port}", file=sys.stderr)

    # distinct JPEG frames (the tunnel content-dedups repeated buffers —
    # including across RUNS, hence the urandom seed; every phase below
    # generates FRESH frames for the same reason)
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))

    def fresh_frames(n):
        out = []
        for _ in range(n):
            img = Image.fromarray((rng.rand(960, 1920, 3) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, "JPEG")
            out.append(buf.getvalue())
        return out

    frames = fresh_frames(n_req)

    # 1. sequential latency
    lats = []
    for f in frames:
        t = time.time()
        _post(port, "/saliency", f)
        lats.append(time.time() - t)
    print(json.dumps({
        "metric": "serve_saliency_latency_ms",
        "median": round(float(np.median(lats)) * 1e3, 1),
        "p90": round(float(np.percentile(lats, 90)) * 1e3, 1),
        "n": n_req,
    }), flush=True)

    # 2. concurrent throughput (dynamic batching)
    done = []
    lock = threading.Lock()

    def client(chunk):
        for f in chunk:
            t = time.time()
            _post(port, "/saliency", f)
            with lock:
                done.append(time.time() - t)

    frames = fresh_frames(n_req)  # phase-1 bytes would be dedup hits
    chunks = [frames[i::conc] for i in range(conc)]
    t0 = time.time()
    ths = [threading.Thread(target=client, args=(c,)) for c in chunks]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    dt = time.time() - t0
    stats = dict(model._batcher.stats)
    print(json.dumps({
        "metric": "serve_saliency_concurrent",
        "clients": conc,
        "requests_per_s": round(n_req / dt, 2),
        "latency_median_ms": round(float(np.median(done)) * 1e3, 1),
        "max_group": stats["max_group"],
    }), flush=True)

    if temporal:
        # 3. concurrent streaming sessions (temporal batching)
        per = max(cfg.seq_len + 1, n_req // conc)

        def session_client(seed, out, i):
            r = np.random.RandomState(seed)  # distinct per session AND run
            sid = json.loads(_post(port, "/temporal/session", b""))["session"]
            for _ in range(per):
                img = Image.fromarray((r.rand(960, 1920, 3) * 255).astype(np.uint8))
                buf = io.BytesIO()
                img.save(buf, "JPEG")
                _post(port, f"/temporal/frame?session={sid}", buf.getvalue())
            _post(port, f"/temporal/close?session={sid}", b"")
            out[i] = per

        out = [0] * conc
        t0 = time.time()
        seeds = [int.from_bytes(os.urandom(4), "little") for _ in range(conc)]
        ths = [threading.Thread(target=session_client, args=(seeds[i], out, i))
               for i in range(conc)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        dt = time.time() - t0
        tstats = dict(model._temporal_batcher.stats)
        print(json.dumps({
            "metric": "serve_temporal_concurrent",
            "sessions": conc,
            "frames_per_s": round(sum(out) / dt, 2),
            "window_max_group": tstats["max_group"],
        }), flush=True)

    httpd.shutdown()


if __name__ == "__main__":
    main()
