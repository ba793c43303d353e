"""Streaming end-to-end throughput (stage1 + stage2 fused, device-resident).

Measures video-frame -> temporal-saliency on one chip with CAM cubes never
leaving the device (cp360_tpu/pipelines/stream.py's compute core), synthetic
decoded frames.  Both window shapes are warmed before timing.
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
    from cp360_tpu.pipelines.extract import host_equi_to_cube_u8, stage1_batch_faces
    from cp360_tpu.pipelines.temporal import window_infer_from_frames

    bb = jax.device_put(init_resnet_params(jax.random.PRNGKey(0), "resnet50"))
    cl = jax.device_put(init_clstm_params(jax.random.PRNGKey(1), 1000, 1000))
    rng = np.random.RandomState(0)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_iters = 6

    frames = [(rng.rand(960, 1920, 3) * 255).astype(np.uint8) for _ in range(b * (n_iters + 2))]

    carry = None
    done = 0
    t0 = time.time()
    for it in range(n_iters + 2):
        batch = frames[it * b : (it + 1) * b]
        faces = np.stack([host_equi_to_cube_u8(f, 224) for f in batch])
        scores, _ = stage1_batch_faces(bb, jnp.asarray(faces), out_dtype=jnp.float16)
        fd = scores if carry is None else jnp.concatenate([carry, scores], 0)
        nw = fd.shape[0] - 4
        preds = np.asarray(
            window_infer_from_frames(cl, fd, jnp.arange(nw, dtype=jnp.int32))
        )
        carry = fd[-4:]
        if it == 1:  # both window shapes compiled after iters 0 and 1
            t0 = time.time()
            done = 0
        elif it > 1:
            done += b
    fps = done / (time.time() - t0)
    print(f"streaming e2e: {fps:.1f} frames/s (video -> temporal saliency, 1 chip)")


if __name__ == "__main__":
    main()
