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
       python tools/bench_serve.py --sweep [n_per_client=8] [max_batch=8]
Prints one JSON line per phase.  max_batch bounds warmup cost: every
power-of-two bucket up to it is a separate remote compile (0.5–4 min each
through this host's helper — see CLAUDE.md).

``--sweep`` (VERDICT r3 #6): serving under load — 1/4/16 clients, MIXED
workload (half `/saliency`, half temporal streaming sessions), with
``serve_request_timeout_s`` armed.  Per level it reports p50/p99 request
latency, achieved requests/s, mean & max coalesced batch, device-worker
occupancy (batcher busy_s / wall), and the 504 count (must be 0 at steady
state on a healthy tunnel).
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


def _post_status(port, path, body, timeout=300):
    """Like _post but returns (status, data) — the sweep counts 504s."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, body=body, headers={"Content-Type": "image/jpeg"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def sweep_main():
    import jax

    if os.environ.get("BENCH_SERVE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_SERVE_PLATFORM"])

    from PIL import Image

    from cp360_tpu.config import Config
    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.serving.server import SaliencyModel, serve

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_per = int(args[0]) if len(args) > 0 else 8
    max_batch = int(args[1]) if len(args) > 1 else 8
    levels = [int(x) for x in
              os.environ.get("BENCH_SERVE_LEVELS", "1,4,16").split(",")]

    cfg = Config(compute_dtype="bfloat16", upload_format="yuv420",
                 serve_max_batch=max_batch,
                 serve_request_timeout_s=float(
                     os.environ.get("BENCH_SERVE_TIMEOUT_S", "180")))
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet50")
    clstm = init_clstm_params(jax.random.PRNGKey(1), 1000, 1000)
    model = SaliencyModel(params, cfg, arch="resnet50", clstm_params=clstm)
    t0 = time.time()
    httpd = serve(model, host="127.0.0.1", port=0, warmup=True)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    print(f"serve: warmup {time.time()-t0:.0f}s, port {port}", file=sys.stderr)

    def jpeg(r):
        img = Image.fromarray((r.rand(960, 1920, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "JPEG")
        return buf.getvalue()

    # per-request tunnel traffic, from the shapes that actually cross it
    # (VERDICT r4 stretch: "quantize the serving D2H"): H2D is the prepped
    # yuv420/u8 cube upload, D2H is ONLY the [2h,4w] f32 map per prediction
    # — scores stay device-resident (server._run_stage1_batch), so the
    # response stream is already ~300x smaller than the upload and an int8
    # response codec would move <0.4% of the request's link bytes
    cd = cfg.cube_dim
    hh = cd // 32  # resnet stage-5 stride -> CAM plane h (224 -> 7)
    up_b = int(6 * cd * cd * (1.5 if cfg.upload_format == "yuv420" else 3))
    down_b = (2 * hh) * (4 * hh) * 4
    print(json.dumps({
        "metric": "serve_link_budget",
        "h2d_bytes_per_request": up_b,
        "d2h_bytes_per_prediction": down_b,
        "d2h_share_of_link": round(down_b / (up_b + down_b), 4),
        "upload_format": cfg.upload_format,
    }), flush=True)

    for conc in levels:
        n_sal = max(1, (conc + 1) // 2)  # mixed: ceil half saliency ...
        n_tmp = conc - n_sal             # ... floor half temporal sessions
        lats, fails = [], []
        lock = threading.Lock()

        def sal_client(seed, bodies):
            for body in bodies:
                t = time.time()
                status, _ = _post_status(port, "/saliency", body)
                with lock:
                    (lats if status == 200 else fails).append(time.time() - t)

        def tmp_client(seed, bodies):
            status, data = _post_status(port, "/temporal/session", b"")
            if status != 200:
                with lock:
                    fails.append(0.0)
                return
            sid = json.loads(data)["session"]
            for body in bodies:
                t = time.time()
                status, _ = _post_status(port, f"/temporal/frame?session={sid}",
                                         body)
                with lock:
                    (lats if status == 200 else fails).append(time.time() - t)
            _post_status(port, f"/temporal/close?session={sid}", b"")

        # fresh per-run seeds: the tunnel content-dedups repeated buffers
        # across runs, which would fake the upload cost
        seeds = [int.from_bytes(os.urandom(4), "little")
                 for _ in range(conc)]
        # PRE-generate every request body before the clock starts: this
        # host has ONE core, so in-loop rand+JPEG-encode (~0.2 s each)
        # competed with the server's own host work and measured the load
        # GENERATOR, not the server — the r4 sweep's 16-client 'regression'
        # was largely this (VERDICT r4 weak #2)
        all_bodies = [[jpeg(np.random.RandomState((s * 1000 + j) % 2**32))
                       for j in range(n_per)] for s in seeds]
        s0 = dict(model._batcher.stats)
        st0 = dict(model._temporal_batcher.stats)
        h0 = dict(model.host_stats)
        ths = ([threading.Thread(target=sal_client,
                                 args=(seeds[i], all_bodies[i]))
                for i in range(n_sal)]
               + [threading.Thread(target=tmp_client,
                                   args=(seeds[n_sal + i],
                                         all_bodies[n_sal + i]))
                  for i in range(n_tmp)])
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        wall = time.time() - t0
        s1 = dict(model._batcher.stats)
        st1 = dict(model._temporal_batcher.stats)
        h1 = dict(model.host_stats)
        d_items = (s1["items"] - s0["items"]) + (st1["items"] - st0["items"])
        d_batches = ((s1["batches"] - s0["batches"])
                     + (st1["batches"] - st0["batches"]))
        d_busy = (s1["busy_s"] - s0["busy_s"]) + (st1["busy_s"] - st0["busy_s"])
        # an all-failed level (every request 504/timeout, plausible in a
        # degraded-tunnel phase) still reports, with null latencies, so the
        # remaining sweep levels run (ADVICE r4)
        print(json.dumps({
            "metric": "serve_sweep",
            "clients": conc,
            "mix": {"saliency": n_sal, "temporal_sessions": n_tmp},
            "requests": len(lats),
            "http_504": len(fails),
            "requests_per_s": round(len(lats) / wall, 2),
            "p50_ms": (round(float(np.percentile(lats, 50)) * 1e3, 1)
                       if lats else None),
            "p99_ms": (round(float(np.percentile(lats, 99)) * 1e3, 1)
                       if lats else None),
            "mean_batch": round(d_items / max(1, d_batches), 2),
            "max_group": max(s1["max_group"], st1["max_group"]),
            "occupancy": round(d_busy / wall, 3),
            # host-CPU share of the wall (decode + prep): the serving
            # ceiling on this 1-core box is named when this approaches 1.0
            "host_cpu": round(((h1["prep_s"] - h0["prep_s"])
                               + (h1["decode_s"] - h0["decode_s"])) / wall, 3),
            "host_prep_ms": round(
                (h1["prep_s"] - h0["prep_s"]) * 1e3
                / max(1, h1["preps"] - h0["preps"]), 1),
            "host_decode_ms": round(
                (h1["decode_s"] - h0["decode_s"]) * 1e3
                / max(1, h1["decodes"] - h0["decodes"]), 1),
        }), flush=True)

    httpd.shutdown()


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
    if "--sweep" in sys.argv:
        sweep_main()
    else:
        main()
