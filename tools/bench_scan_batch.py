"""Scan-batch sweep of the full fused stage-1 graph (device-resident).

bench.py's compute-only ``device_fps`` reuses the e2e graph at BENCH_BATCH
(16 — chosen by a *tunnel* sweep: the 32-frame batch hit the relay's
flow-control wall).  Device-resident, the tradeoff is different: a larger
batch amortizes the ~1.3 ms scan-iteration overhead and fills the MXU at
the shallow C<=64 stages, so the compute ceiling may sit at a batch the
link can't carry.  This tool measures the scanned rate of the IDENTICAL
fused graph (YUV->RGB, cube-padded ResNet-50 CAM, cube->equi, saliency,
in-graph int8 codec — pipelines/extract.py::stage1_batch_faces_yuv) across
batch sizes, one process, one scanned dispatch per rep (standalone op
timings lie through this relay — CLAUDE.md).

Replaces nothing in the reference (its extractor is a fixed batch-1 torch
loop, static_model/dataset_feat_extractor.py:119-192); this calibrates OUR
headline compute number's operating point.

Also sweeps the transfer codec per batch (``int8`` = the e2e graph's
in-graph quantization, ~3.2 ms of the 22.7 ms r4 profile; ``none`` = the
pure compute graph a PCIe-attached host would run, no link codec), so the
codec's compute share is measured rather than assumed.

Usage: python tools/bench_scan_batch.py [batches=16,32,64] [n_frames=160]
           [codecs=int8,none]
Prints one JSON line per (batch, codec), then a summary line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batches = [int(x) for x in (argv[0].split(",") if argv else ["16", "32", "64"])]
    n_frames = int(argv[1]) if len(argv) > 1 else 160
    codecs = argv[2].split(",") if len(argv) > 2 else ["int8", "none"]

    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.pipelines.extract import stage1_batch_faces_yuv

    params = jax.device_put(init_resnet_params(jax.random.PRNGKey(0), "resnet50"))

    results = []
    for batch, codec in [(b, c) for b in batches for c in codecs]:
        n_iters = max(2, n_frames // batch)

        def compute(yuv, batch=batch, codec=codec):
            return stage1_batch_faces_yuv(
                params, *yuv, arch="resnet50", use_cube_pad=True,
                compute_dtype=jnp.bfloat16, out_dtype=jnp.float16,
                codec=codec,
            )

        @jax.jit
        def make(k, batch=batch):
            ky, kuv = jax.random.split(k)
            y = jax.random.randint(ky, (batch, 6, 224, 224), 0, 256, jnp.uint8)
            uv = jax.random.randint(kuv, (batch, 6, 112, 112, 2), 0, 256,
                                    jnp.uint8)
            return y, uv

        key = jax.random.PRNGKey(7)
        planes = [make(jax.random.fold_in(key, i)) for i in range(n_iters)]
        ys = jnp.stack([p[0] for p in planes])
        uvs = jnp.stack([p[1] for p in planes])

        @jax.jit
        def scanned(ys, uvs):
            def body(a, yuv):
                outs = compute(yuv)
                return a + sum(jnp.sum(o[:1, :1].astype(jnp.float32))
                               for o in outs), None
            a, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (ys, uvs))
            return a

        t0 = time.time()
        assert np.isfinite(float(scanned(ys, uvs)))  # compile + warm
        compile_s = time.time() - t0
        reps = []
        for _ in range(5):
            t0 = time.time()
            assert np.isfinite(float(scanned(ys, uvs)))
            reps.append(time.time() - t0)
        ms = [r / n_iters * 1e3 for r in reps]
        fps = [batch / (m / 1e3) for m in ms]
        line = {
            "metric": "stage1_scan_batch",
            "batch": batch,
            "codec": codec,
            "n_iters": n_iters,
            "ms_per_batch": round(float(np.median(ms)), 2),
            "fps": round(float(np.median(fps)), 1),
            "fps_iqr": [round(float(np.percentile(fps, 25)), 1),
                        round(float(np.percentile(fps, 75)), 1)],
            "compile_s": round(compile_s, 1),
        }
        results.append(line)
        print(json.dumps(line), flush=True)

    best = max(results, key=lambda r: r["fps"])
    print(json.dumps({"metric": "stage1_scan_batch_best",
                      "batch": best["batch"], "codec": best["codec"],
                      "fps": best["fps"],
                      "fps_iqr": best["fps_iqr"]}), flush=True)


if __name__ == "__main__":
    main()
