"""Decompose the fused stage-1 graph's device time by component.

The round-4 scanned device-resident rate is 524.7 fps = 30.5 ms per
16-frame batch (`BENCH_DEVICE_SCAN.json`), i.e. ~13 TF/s effective on the
ResNet-50 FLOPs — while the ConvLSTM train step reaches ~105 TF/s on this
libtpu.  This tool times each stage of the graph in isolation with the
same chained-scan discipline (one dispatch, accumulator-gated; per-call
dispatch through this relay costs tens of ms and would swamp the numbers)
to find where the 30.5 ms actually goes:

  yuv:     4:2:0 -> RGB + ImageNet normalize
  resnet:  the cube-padded ResNet-50 forward (CAM scores)
  zeropad: same backbone with zero padding (isolates cube_pad's cost)
  project: CAM -> equi projection + saliency max
  quant:   in-graph int8 codec
  full:    the shipped graph end-to-end (sanity: sum of parts)

Usage: python tools/profile_stage1.py [batch=16] [n_iters=10]
Prints one JSON line with ms/batch per component.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _scan_time(jax, jnp, fn, xs, n_iters):
    """ms per iteration of fn over stacked xs, one scanned dispatch."""

    @jax.jit
    def scanned(xs):
        def body(a, x):
            outs = fn(x)
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            return a + sum(jnp.sum(o.reshape(-1)[:2].astype(jnp.float32))
                           for o in outs), None
        a, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return a

    float(scanned(xs))  # compile + warm
    t0 = time.time()
    assert np.isfinite(float(scanned(xs)))
    return (time.time() - t0) / n_iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.ops.quantize import quantize_cam
    from cp360_tpu.ops.resample import cube_to_equi
    from cp360_tpu.pipelines.extract import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        _backbone_cam,
        _device_yuv420_to_rgb01,
        stage1_batch_faces_yuv,
    )
    from cp360_tpu.utils.transfer import warm_link

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    warm_link()

    params = jax.device_put(init_resnet_params(jax.random.PRNGKey(0),
                                               "resnet50"))
    key = jax.random.PRNGKey(42)

    @jax.jit
    def make(k):
        ky, kuv = jax.random.split(k)
        y = jax.random.randint(ky, (batch, 6, 224, 224), 0, 256, jnp.uint8)
        uv = jax.random.randint(kuv, (batch, 6, 112, 112, 2), 0, 256,
                                jnp.uint8)
        return y, uv

    planes = [make(jax.random.fold_in(key, i)) for i in range(n_iters)]
    ys = jnp.stack([p[0] for p in planes])
    uvs = jnp.stack([p[1] for p in planes])

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    @jax.jit
    def pre(yuv):
        return ((_device_yuv420_to_rgb01(*yuv) - mean) / std).astype(
            jnp.bfloat16)

    cubes = [pre((p[0], p[1])) for p in planes]
    cubes_s = jnp.stack(cubes)
    scores0, _ = _backbone_cam(params, cubes[0].astype(jnp.float32),
                               "resnet50", True, jnp.bfloat16)
    scores = jnp.stack([scores0] * n_iters)  # shapes only; data irrelevant

    results = {}
    results["yuv_norm"] = _scan_time(
        jax, jnp, lambda yuv: (_device_yuv420_to_rgb01(*yuv) - mean) / std,
        (ys, uvs), n_iters)
    results["resnet_cubepad"] = _scan_time(
        jax, jnp,
        lambda c: _backbone_cam(params, c.astype(jnp.float32), "resnet50",
                                True, jnp.bfloat16)[0],
        cubes_s, n_iters)
    results["resnet_zeropad"] = _scan_time(
        jax, jnp,
        lambda c: _backbone_cam(params, c.astype(jnp.float32), "resnet50",
                                False, jnp.bfloat16)[0],
        cubes_s, n_iters)
    results["project_saliency"] = _scan_time(
        jax, jnp, lambda s: jnp.max(cube_to_equi(s), axis=-1) ** 2,
        scores, n_iters)
    results["quant_int8"] = _scan_time(
        jax, jnp, lambda s: quantize_cam(s, scale_dtype=jnp.float16),
        scores, n_iters)
    results["full"] = _scan_time(
        jax, jnp,
        lambda yuv: stage1_batch_faces_yuv(params, *yuv, codec="int8"),
        (ys, uvs), n_iters)

    out = {"metric": "stage1_ms_per_batch", "batch": batch,
           "n_iters": n_iters,
           "components_ms": {k: round(v, 2) for k, v in results.items()},
           "full_fps": round(batch / results["full"] * 1e3, 1)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
