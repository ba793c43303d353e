"""HTTP saliency-inference server (stdlib-only, threaded).

The reference is a batch research pipeline with no serving story; this is
the deployment surface for the same models: a long-lived process holding the
compiled stage-1 graph (and optionally the ConvLSTM) on the TPU, answering

    GET  /healthz                    -> {"status": "ok", ...}
    POST /saliency                   -> image bytes (JPEG/PNG equi frame) in,
                                        JSON {"saliency": [...], "shape": [h, w]} out
    POST /saliency?format=png        -> grayscale PNG heatmap out
    POST /temporal/session           -> {"session": id}  (needs --clstm)
    POST /temporal/frame?session=ID  -> image bytes in; {"pending": k} until
                                        seq_len frames are buffered, then
                                        {"frame": i, "shape", "saliency"}
    POST /temporal/close?session=ID  -> {"closed": true}

Temporal sessions stream the stage-2 model statefully: the session state is
the rolling window of the last seq_len stage-1 CAM cubes, kept ON DEVICE.
Each new frame re-runs the published window protocol (joint min/max
normalization + ConvLSTM state seeded from the window's first frame,
temporal_model/test_temporal.py:66-79) over that window, so a streaming
client sees exactly the offline pipeline's predictions, one frame of
latency at a time.  A raw (h, c) carry across frames would be cheaper but
is NOT the protocol the published numbers use — the eval re-seeds state
per window — so the window ring is the faithful serving mode.

Concurrent requests are coalesced by dynamic batchers (serving/batcher.py):
host prep (decode, resize, cube remap, optional 4:2:0 pack) runs on the
HTTP handler threads, then all device work funnels through worker threads
that group up to ``serve_max_batch`` pending requests (waiting at most
``serve_batch_window_ms`` after the first) into ONE fused device step,
padded to a power-of-two bucket so the jit cache stays small.  Stage-1
frames and temporal window inferences batch independently — concurrent
temporal sessions share both the ResNet step and the ConvLSTM dispatch;
pushes within one session serialize on a per-session lock (protocol
order).  Device access is mutually exclusive (``_device_lock``) — what
this host's transfer relay requires (concurrent client-thread transfers
intermittently wedge it).  Frames are resized to the configured operating
point on host, exactly like the offline pipeline.

Channel-order parity: the server passes the decoded image's channel order
through unchanged.  The offline pipeline deliberately feeds cv2's BGR
bytes labeled RGB (pipelines/extract.py::_resize_frame_pil — a reference
quirk the published numbers bake in), so BIT-parity with offline
artifacts requires the client to send frames in that same byte order:
hand raw cv2 frames to serving/client.py's encoder as-is (no
cv2.cvtColor).  A client sending true-RGB images gets channel-correct
(but offline-divergent) predictions.
"""

from __future__ import annotations

import io
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from cp360_tpu.config import Config

MAX_SESSIONS = 64
SESSION_IDLE_TTL_S = 600.0  # abandoned sessions are evicted after this


class RequestMetrics:
    """Thread-safe request counters/latency for the /metrics endpoint."""

    def __init__(self):
        self._lock = threading.Lock()
        self._requests: dict = {}  # (route, code) -> count
        self._latency: dict = {}  # route -> [sum_s, count]
        self.started = time.time()

    def observe(self, route: str, code: int, dur_s: float) -> None:
        with self._lock:
            key = (route, code)
            self._requests[key] = self._requests.get(key, 0) + 1
            s = self._latency.setdefault(route, [0.0, 0])
            s[0] += dur_s
            s[1] += 1

    def render(self, model: "SaliencyModel") -> str:
        """Prometheus text exposition (counters + live gauges)."""
        with self._lock:
            reqs = dict(self._requests)
            lat = {r: tuple(v) for r, v in self._latency.items()}
        lines = [
            "# TYPE cp360_requests_total counter",
            *(f'cp360_requests_total{{route="{r}",code="{c}"}} {n}'
              for (r, c), n in sorted(reqs.items())),
            "# TYPE cp360_request_seconds_sum counter",
            *(f'cp360_request_seconds_sum{{route="{r}"}} {s:.6f}'
              for r, (s, _) in sorted(lat.items())),
            "# TYPE cp360_request_seconds_count counter",
            *(f'cp360_request_seconds_count{{route="{r}"}} {n}'
              for r, (_, n) in sorted(lat.items())),
            "# TYPE cp360_uptime_seconds gauge",
            f"cp360_uptime_seconds {time.time() - self.started:.1f}",
        ]
        batchers = [("stage1", model._batcher)]
        if model._temporal_batcher is not None:
            batchers.append(("temporal", model._temporal_batcher))
        for metric, kind in (("batches_total", "counter"),
                             ("items_total", "counter"),
                             ("timeouts_total", "counter"),
                             ("max_group", "gauge"),
                             ("busy_seconds", "gauge")):
            lines.append(f"# TYPE cp360_batcher_{metric} {kind}")
            for name, b in batchers:
                stat = metric.removesuffix("_total")
                val = (f"{b.busy_for_s():.3f}" if metric == "busy_seconds"
                       else b.stats[stat])
                lines.append(
                    f'cp360_batcher_{metric}{{batcher="{name}"}} {val}')
        lines.append("# TYPE cp360_sessions_active gauge")
        lines.append(f"cp360_sessions_active {len(model._sessions)}")
        return "\n".join(lines) + "\n"


class SaliencyModel:
    """Holds params + the compiled stage-1 step (and optionally the
    ConvLSTM + streaming sessions); thread-safe predict()/temporal_*()."""

    def __init__(self, params: dict, cfg: Config, arch: str = "resnet50",
                 clstm_params: dict | None = None):
        import jax
        import jax.numpy as jnp

        from cp360_tpu.serving.batcher import DynamicBatcher

        self.params = params
        self.cfg = cfg
        self.arch = arch
        self.clstm_params = clstm_params
        self._jnp = jnp
        self.request_metrics = RequestMetrics()
        # data-parallel serving: with mesh_data > 1 the fused batch steps
        # shard requests over this host's devices (GSPMD via sharded inputs
        # + replicated params — predictions are bit-identical, throughput
        # scales with chips).  The model axis is not used here: serving
        # batches are the natural parallelism for request traffic.
        self.mesh = None
        if cfg.mesh_data > 1:
            from cp360_tpu.parallel import mesh as pm

            self.mesh = pm.local_data_mesh(
                pm.make_mesh(n_data=cfg.mesh_data, n_model=1,
                             devices=jax.local_devices()[:cfg.mesh_data]))
            self.params = jax.device_put(params, pm.replicated(self.mesh))
            if clstm_params is not None:
                self.clstm_params = jax.device_put(
                    clstm_params, pm.replicated(self.mesh))
        self._warming = False  # warmup submits bypass the request timeout
        # host-side per-request work (decode, remap, yuv pack) — the
        # serving ceiling on a CPU-poor host; written GIL-atomically by
        # handler threads, read by /healthz and the sweep bench
        self.host_stats = {"prep_s": 0.0, "preps": 0,
                           "decode_s": 0.0, "decodes": 0}
        self._lock = threading.Lock()
        self._sessions: dict = {}  # id -> list of device [6, h, w, C] cubes
        # every transfer/dispatch goes through either the batcher worker or
        # a section holding _device_lock — never two threads at once (the
        # relay wedges on concurrent client-thread transfers)
        self._device_lock = threading.Lock()
        # with a mesh, device batches must be multiples of the data-axis
        # size; round the operator's cap DOWN to one (min: one full shard
        # row) so _bucket never pads a group above the configured limit
        max_batch = max(1, cfg.serve_max_batch)
        if self.mesh is not None:
            d = self.mesh.shape["data"]
            max_batch = max(d, (max_batch // d) * d)
        self._batcher = DynamicBatcher(
            self._run_stage1_batch,
            max_batch=max_batch,
            window_ms=cfg.serve_batch_window_ms,
            name="stage1",
        )
        # temporal sessions coalesce too: concurrent sessions' window
        # inferences share one padded ConvLSTM dispatch (the window protocol
        # normalizes and seeds state per window, so batching cannot change
        # any prediction)
        self._temporal_batcher = None
        if clstm_params is not None:
            self._temporal_batcher = DynamicBatcher(
                self._run_window_batch,
                max_batch=max_batch,
                window_ms=cfg.serve_batch_window_ms,
                name="temporal",
            )

    def warmup(self) -> None:
        """Compile every stage-1 bucket size (and the temporal path) so the
        first real burst doesn't pay a multi-second device compile.

        Warmup submits bypass ``serve_request_timeout_s`` — first compiles
        legitimately take minutes, and timing one out would crash-loop the
        server under a process supervisor.
        """
        self._warming = True
        try:
            self._warmup()
        finally:
            self._warming = False

    def _warmup(self) -> None:
        dummy = np.zeros((self.cfg.equi_w, self.cfg.equi_h, 3), np.uint8)
        prep = self._host_prep(dummy)
        b, seen = 1, set()
        while True:
            bs = self._bucket(b, self._batcher.max_batch)
            if bs not in seen:
                seen.add(bs)
                self._run_stage1_batch([prep] * bs)
            if bs >= self._batcher.max_batch:
                break
            b *= 2
        if self.clstm_params is not None:
            sid = self.temporal_start()
            for _ in range(self.cfg.seq_len):
                self.temporal_push(sid, dummy)
            # the pushes compiled the window batch at bucket 1; warm the
            # larger buckets a concurrent-session burst would hit
            window = tuple(self._sessions[sid]["frames"])
            b = 2
            while True:
                bs = self._bucket(b, self._temporal_batcher.max_batch)
                self._run_window_batch([window] * bs)
                if bs >= self._temporal_batcher.max_batch:
                    break
                b *= 2
            self.temporal_close(sid)

    def _compute_dtype(self):
        jnp = self._jnp
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    def _bucket(self, n: int, max_batch: int) -> int:
        """Jit-cache bucket for n pending requests: power-of-two, and with a
        mesh also a multiple of the data-axis size (even shards)."""
        from cp360_tpu.serving.batcher import bucket_size

        b = bucket_size(n, max_batch)
        if self.mesh is not None:
            d = self.mesh.shape["data"]
            b = -(-b // d) * d
        return b

    def _put_batch(self, arrays):
        """Host batch -> device: batch-sharded over the mesh's data axis when
        serving data-parallel, plain asarray otherwise."""
        if self.mesh is None:
            return [self._jnp.asarray(a) for a in arrays]
        import jax

        from cp360_tpu.parallel.mesh import data_sharding

        sh = data_sharding(self.mesh)
        return [jax.device_put(a, sh) for a in arrays]

    def _host_prep(self, frame_u8: np.ndarray):
        """Resize + cube remap + optional 4:2:0 pack — pure host work, runs
        on the calling (HTTP handler) thread so requests prep in parallel."""
        from PIL import Image

        from cp360_tpu.pipelines.extract import (
            host_equi_to_cube_u8,
            host_rgb_to_yuv420,
        )

        t0 = time.monotonic()
        wh = (self.cfg.equi_h, self.cfg.equi_w)
        if frame_u8.shape[:2] == (wh[1], wh[0]):
            # already at protocol size: the Lanczos pass was a ~full-frame
            # no-op costing tens of host-ms per request on this 1-core box
            # (identical pixels — PIL resize to the same size is identity)
            equi = frame_u8
        else:
            img = Image.fromarray(frame_u8).resize(
                wh, resample=getattr(Image, "LANCZOS", Image.Resampling.LANCZOS)
            )
            equi = np.asarray(img, np.uint8)
        faces = host_equi_to_cube_u8(equi, self.cfg.cube_dim)
        out = (host_rgb_to_yuv420(faces)
               if self.cfg.upload_format == "yuv420" else (faces,))
        # monitoring-grade accumulation (GIL-atomic enough, like batcher
        # stats): names the host-CPU share of the serving ceiling
        self.host_stats["prep_s"] += time.monotonic() - t0
        self.host_stats["preps"] += 1
        return out

    def _run_stage1_batch(self, preps: list):
        """Batcher callback: N prepped requests -> ONE fused device step.

        Pads the group to a power-of-two bucket (repeating the last item) so
        the jit cache holds ~log2(max_batch) executables, fetches the batch's
        saliency in one async D2H, and hands each caller (scores_i [6,h,w,C]
        device, sal_i [2h,4w] np.float32).
        """
        from cp360_tpu.pipelines.extract import (
            stage1_batch_faces,
            stage1_batch_faces_yuv,
        )
        from cp360_tpu.utils.transfer import fetch_np

        n = len(preps)
        b = self._bucket(n, self._batcher.max_batch)
        padded = list(preps) + [preps[-1]] * (b - n)
        stacked = [np.stack(parts) for parts in zip(*padded)]
        fn = (stage1_batch_faces_yuv if self.cfg.upload_format == "yuv420"
              else stage1_batch_faces)
        with self._device_lock:
            scores, sal = fn(
                self.params, *self._put_batch(stacked),
                arch=self.arch, use_cube_pad=self.cfg.cube_pad,
                compute_dtype=self._compute_dtype(),
            )
            sal_np = fetch_np(sal)
            # the per-item score slices dispatch device work too — they
            # must stay under the lock (the temporal batcher worker may
            # otherwise drive the relay concurrently, which wedges it)
            per_item = [(scores[i], sal_np[i]) for i in range(n)]
        return per_item

    def _timeout_s(self):
        if self._warming:
            return None  # first compiles take minutes; see warmup()
        t = self.cfg.serve_request_timeout_s
        return t if t > 0 else None

    def _stage1(self, frame_u8: np.ndarray):
        """One frame through the batched stage-1 path.  Returns
        (scores [6,h,w,C] device, sal [2h,4w] np.float32)."""
        return self._batcher.submit(self._host_prep(frame_u8),
                                    timeout_s=self._timeout_s())

    def predict(self, frame_u8: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 equi frame -> [2h, 4w] saliency map (f32).

        Thread-safe and batch-coalesced: concurrent callers share one fused
        device step (see serving/batcher.py)."""
        _, sal = self._stage1(frame_u8)
        return sal

    # ---- temporal streaming sessions ------------------------------------

    def _evict_idle(self) -> None:
        """Drop sessions idle past SESSION_IDLE_TTL_S (callers hold _lock).

        Clients that crash without POSTing /temporal/close must not pin
        device memory or wedge the MAX_SESSIONS cap forever.
        """
        now = time.monotonic()
        for sid in [s for s, v in self._sessions.items()
                    if now - v["last_used"] > SESSION_IDLE_TTL_S]:
            del self._sessions[sid]

    def temporal_start(self) -> str:
        if self.clstm_params is None:
            raise LookupError("server started without a ConvLSTM (--clstm)")
        with self._lock:
            self._evict_idle()
            if len(self._sessions) >= MAX_SESSIONS:
                raise OverflowError(f"too many sessions (max {MAX_SESSIONS})")
            sid = uuid.uuid4().hex[:12]
            self._sessions[sid] = {"frames": [], "count": 0,
                                   "last_used": time.monotonic(),
                                   "lock": threading.Lock()}
        return sid

    def _run_window_batch(self, windows: list):
        """Temporal-batcher callback: N session windows -> ONE padded
        ConvLSTM dispatch + one async D2H.

        Each item is a session's rolling tuple of seq_len stage-1 cubes
        (device arrays).  Pads to a power-of-two bucket like stage 1 so the
        jit cache stays small; per-window normalization/state seeding make
        the batched predictions identical to running each window alone.
        """
        from cp360_tpu.pipelines.temporal import window_infer
        from cp360_tpu.utils.transfer import fetch_np

        jnp = self._jnp
        n = len(windows)
        b = self._bucket(n, self._temporal_batcher.max_batch)
        padded = list(windows) + [windows[-1]] * (b - n)
        with self._device_lock:
            batch = jnp.stack([jnp.stack(w) for w in padded])  # [b,T,6,h,w,C]
            if self.mesh is not None:
                import jax

                from cp360_tpu.parallel.mesh import data_sharding

                batch = jax.device_put(batch, data_sharding(self.mesh))
            sal = window_infer(
                self.clstm_params, batch, use_cube_pad=self.cfg.cube_pad,
                compute_dtype=self._compute_dtype(),
                conv_impl=self.cfg.clstm_conv_impl,
            )
            sal_np = fetch_np(sal)
        return [sal_np[i] for i in range(n)]

    def temporal_push(self, sid: str, frame_u8: np.ndarray):
        """Push one frame into a session.

        Returns (frame_index, saliency [2h,4w] | None): None while fewer
        than seq_len frames are buffered; afterwards the prediction of the
        window ending at this frame (identical to the offline pipeline's
        prediction for that window).

        Thread-safe and coalescing: pushes WITHIN a session serialize on the
        session's own lock (protocol order), while different sessions
        proceed concurrently so their stage-1 steps and window inferences
        group in the two dynamic batchers.
        """
        seq_len = self.cfg.seq_len
        with self._lock:
            self._evict_idle()
            sess = self._sessions.get(sid)
            if sess is None:
                raise KeyError(sid)
            sess["last_used"] = time.monotonic()
        with sess["lock"]:
            # session state commits only after every fallible step — a
            # TimeoutError (504) must leave the window untouched so the
            # client can retry the SAME frame without corrupting the
            # protocol (double-buffered frame, skipped index)
            scores, _ = self._stage1(frame_u8)
            frames = (sess["frames"] + [scores])[-seq_len:]
            idx = sess["count"]
            if len(frames) < seq_len:
                sal = None
            else:
                sal = self._temporal_batcher.submit(
                    tuple(frames), timeout_s=self._timeout_s())
            sess["frames"] = frames
            sess["count"] = idx + 1
            if sal is None:
                return idx, None
        with self._lock:
            if sid in self._sessions:
                sess["last_used"] = time.monotonic()
        return idx, sal

    def temporal_close(self, sid: str) -> None:
        with self._lock:
            if sid not in self._sessions:
                raise KeyError(sid)
            del self._sessions[sid]


def make_handler(model: SaliencyModel):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str = "application/json"):
            self._sent_code = code
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        _KNOWN_ROUTES = frozenset(
            ["healthz", "metrics", "saliency",
             "temporal_session", "temporal_frame", "temporal_close"])

        def _route_label(self) -> str:
            # unknown paths collapse to one label: arbitrary request paths
            # must not grow metric cardinality without bound or inject
            # unescaped characters into the Prometheus exposition
            p = urlparse(self.path).path.rstrip("/")
            if p.startswith("/temporal/"):
                label = "temporal_" + p.split("/")[2]
            else:
                label = p.lstrip("/") or "healthz"
            return label if label in self._KNOWN_ROUTES else "other"

        def do_GET(self):
            t0 = time.monotonic()
            self._sent_code = 0
            try:
                self._get()
            finally:
                model.request_metrics.observe(
                    self._route_label(), self._sent_code,
                    time.monotonic() - t0)

        def do_POST(self):
            t0 = time.monotonic()
            self._sent_code = 0
            try:
                self._post()
            finally:
                model.request_metrics.observe(
                    self._route_label(), self._sent_code,
                    time.monotonic() - t0)

        def _get(self):
            if self.path.rstrip("/") == "/metrics":
                self._send(200, model.request_metrics.render(model).encode(),
                           "text/plain; version=0.0.4")
            elif self.path.rstrip("/") in ("", "/healthz"):
                info = {
                    "status": "ok",
                    "arch": model.arch,
                    "cube_dim": model.cfg.cube_dim,
                    "frame_hw": list(model.cfg.frame_hw),
                    "temporal": model.clstm_params is not None,
                    "seq_len": model.cfg.seq_len,
                    "data_parallel": (model.mesh.shape["data"]
                                      if model.mesh is not None else 1),
                    "batching": {
                        "max_batch": model._batcher.max_batch,
                        "window_ms": model._batcher.window_s * 1000.0,
                        **model._batcher.stats,
                    },
                }
                if model._temporal_batcher is not None:
                    info["temporal_batching"] = dict(model._temporal_batcher.stats)
                info["host"] = dict(model.host_stats)
                self._send(200, json.dumps(info).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        def _read_frame(self):
            length = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(length)
            from PIL import Image

            t0 = time.monotonic()
            img = Image.open(io.BytesIO(raw)).convert("RGB")
            out = np.asarray(img, np.uint8)
            model.host_stats["decode_s"] += time.monotonic() - t0
            model.host_stats["decodes"] += 1
            return out

        def _do_temporal(self, route: str):
            qs = parse_qs(urlparse(self.path).query)
            sid = qs.get("session", [None])[0]
            try:
                if route == "session":
                    self._send(200, json.dumps({"session": model.temporal_start()}).encode())
                elif route == "close":
                    model.temporal_close(sid)
                    self._send(200, b'{"closed": true}')
                elif route == "frame":
                    try:
                        frame = self._read_frame()
                    except Exception as e:
                        self._send(400, json.dumps({"error": f"bad image: {e}"}).encode())
                        return
                    idx, sal = model.temporal_push(sid, frame)
                    if sal is None:
                        body = {"frame": idx, "pending": model.cfg.seq_len - idx - 1}
                    else:
                        body = {"frame": idx, "shape": list(sal.shape),
                                "saliency": sal.tolist()}
                    self._send(200, json.dumps(body).encode())
                else:
                    self._send(404, b'{"error": "not found"}')
            except LookupError as e:  # unknown session / no ConvLSTM loaded
                self._send(404, json.dumps({"error": str(e)}).encode())
            except OverflowError as e:
                self._send(429, json.dumps({"error": str(e)}).encode())
            except TimeoutError as e:  # serve_request_timeout_s exceeded
                self._send(504, json.dumps({"error": str(e)}).encode())
            except Exception as e:  # device error mid-step, batcher closed
                self._send(500, json.dumps({"error": str(e)}).encode())

        def _post(self):
            if self.path.startswith("/temporal/"):
                self._do_temporal(urlparse(self.path).path.split("/")[2])
                return
            if not self.path.startswith("/saliency"):
                self._send(404, b'{"error": "not found"}')
                return
            try:
                frame = self._read_frame()
            except Exception as e:
                self._send(400, json.dumps({"error": f"bad image: {e}"}).encode())
                return

            try:
                sal = model.predict(frame)
            except TimeoutError as e:  # serve_request_timeout_s exceeded
                self._send(504, json.dumps({"error": str(e)}).encode())
                return
            except Exception as e:  # device error mid-step, batcher closed
                self._send(500, json.dumps({"error": str(e)}).encode())
                return
            if "format=png" in self.path:
                lo, hi = float(sal.min()), float(sal.max())
                norm = (sal - lo) / (hi - lo) if hi > lo else sal * 0
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray((norm * 255).astype(np.uint8), "L").save(buf, "PNG")
                self._send(200, buf.getvalue(), "image/png")
            else:
                body = json.dumps(
                    {"shape": list(sal.shape), "saliency": sal.tolist()}
                ).encode()
                self._send(200, body)

    return Handler


def serve(model: SaliencyModel, host: str = "127.0.0.1", port: int = 8360,
          warmup: bool = True) -> ThreadingHTTPServer:
    """Start the server (returns it; call .serve_forever() or use the CLI)."""
    if warmup:
        model.warmup()
    return ThreadingHTTPServer((host, port), make_handler(model))
