"""HTTP saliency-inference server (stdlib-only, threaded).

The reference is a batch research pipeline with no serving story; this is
the deployment surface for the same models: a long-lived process holding the
compiled stage-1 graph (and optionally the ConvLSTM) on the TPU, answering

    GET  /healthz            -> {"status": "ok", ...}
    POST /saliency           -> image bytes (JPEG/PNG equi frame) in,
                                JSON {"saliency": [[...]], "shape": [h, w]} out
    POST /saliency?format=png-> grayscale PNG heatmap out

Requests are served from a single device worker thread (JAX computations
are enqueued; the HTTP layer is ThreadingHTTPServer).  Frames are resized
to the configured operating point on host, exactly like the offline
pipeline.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from cp360_tpu.config import Config


class SaliencyModel:
    """Holds params + the compiled stage-1 step; thread-safe predict()."""

    def __init__(self, params: dict, cfg: Config, arch: str = "resnet50"):
        import jax.numpy as jnp

        self.params = params
        self.cfg = cfg
        self.arch = arch
        self._jnp = jnp
        self._lock = threading.Lock()

    def warmup(self) -> None:
        dummy = np.zeros((self.cfg.equi_w, self.cfg.equi_h, 3), np.uint8)
        self.predict(dummy)

    def predict(self, frame_u8: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 equi frame -> [2h, 4w] saliency map (f32)."""
        from PIL import Image

        from cp360_tpu.pipelines.extract import host_equi_to_cube_u8, stage1_batch_faces

        jnp = self._jnp
        wh = (self.cfg.equi_h, self.cfg.equi_w)
        img = Image.fromarray(frame_u8).resize(
            wh, resample=getattr(Image, "LANCZOS", Image.Resampling.LANCZOS)
        )
        faces = host_equi_to_cube_u8(np.asarray(img, np.uint8), self.cfg.cube_dim)
        with self._lock:
            _, sal = stage1_batch_faces(
                self.params, jnp.asarray(faces[None]), arch=self.arch,
                use_cube_pad=self.cfg.cube_pad,
                compute_dtype=jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32,
            )
            out = np.asarray(sal[0])
        return out


def make_handler(model: SaliencyModel):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/healthz"):
                info = {
                    "status": "ok",
                    "arch": model.arch,
                    "cube_dim": model.cfg.cube_dim,
                    "frame_hw": list(model.cfg.frame_hw),
                }
                self._send(200, json.dumps(info).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if not self.path.startswith("/saliency"):
                self._send(404, b'{"error": "not found"}')
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                from PIL import Image

                img = Image.open(io.BytesIO(raw)).convert("RGB")
                frame = np.asarray(img, np.uint8)
            except Exception as e:
                self._send(400, json.dumps({"error": f"bad image: {e}"}).encode())
                return

            sal = model.predict(frame)
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
