"""Streaming end-to-end throughput (stage1 + stage2 fused, device-resident).

Measures video-frame -> temporal-saliency on one chip with CAM cubes never
leaving the device (cp360_tpu/pipelines/stream.py's compute core), synthetic
decoded frames.  Mirrors the production pipeline shape: host remap worker
pool, 4:2:0 upload (STREAM_UPLOAD=rgb8 for the exact path), async D2H of
the saliency maps.  Both window shapes are warmed before timing.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.pipelines.extract import (
        host_faces_for_upload,
        stage1_batch_faces,
        stage1_batch_faces_yuv,
    )
    from cp360_tpu.pipelines.temporal import window_infer_from_frames
    from cp360_tpu.utils.transfer import fetch_np

    yuv = os.environ.get("STREAM_UPLOAD", "yuv420") == "yuv420"
    bb = jax.device_put(init_resnet_params(jax.random.PRNGKey(0), "resnet50"))
    cl = jax.device_put(init_clstm_params(jax.random.PRNGKey(1), 1000, 1000))
    rng = np.random.RandomState(0)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_iters = 6

    frames = [(rng.rand(960, 1920, 3) * 255).astype(np.uint8)
              for _ in range(b * (n_iters + 2))]

    from concurrent.futures import ThreadPoolExecutor

    def remap(f):
        return host_faces_for_upload(f, 224, yuv)

    pool = ThreadPoolExecutor(max_workers=4)
    futs = [pool.submit(remap, f) for f in frames]

    carry = None
    done = 0
    t0 = time.time()
    for it in range(n_iters + 2):
        batch = [f.result() for f in futs[it * b:(it + 1) * b]]
        if yuv:
            scores, _ = stage1_batch_faces_yuv(
                bb, jnp.asarray(np.stack([d[0] for d in batch])),
                jnp.asarray(np.stack([d[1] for d in batch])),
                out_dtype=jnp.float16)
        else:
            scores, _ = stage1_batch_faces(
                bb, jnp.asarray(np.stack(batch)), out_dtype=jnp.float16)
        fd = scores if carry is None else jnp.concatenate([carry, scores], 0)
        nw = fd.shape[0] - 4
        preds_dev = window_infer_from_frames(
            cl, fd, jnp.arange(nw, dtype=jnp.int32))
        preds = fetch_np(preds_dev)  # enqueues the async D2H itself
        assert np.isfinite(preds).all()
        carry = fd[-4:]
        if it == 1:  # both window shapes compiled after iters 0 and 1
            t0 = time.time()
            done = 0
        elif it > 1:
            done += b
    fps = done / (time.time() - t0)
    pool.shutdown(wait=False)
    print(f"streaming e2e: {fps:.1f} frames/s "
          f"({'yuv420' if yuv else 'rgb8'} upload, video -> temporal "
          f"saliency, 1 chip)")
    import json

    print(json.dumps({
        "metric": "stream_frames_per_sec", "value": round(fps, 1),
        "unit": "frames/s (video -> temporal saliency, both stages fused, "
                "1 chip)",
        "upload": "yuv420" if yuv else "rgb8",
    }), flush=True)


if __name__ == "__main__":
    main()
