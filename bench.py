"""Benchmark: stage-1 frames/sec on one TPU chip, vs the torch-CPU reference.

Measures the flagship fused device step (equirectangular frame -> cube faces
-> cube-padded ResNet-50 CAM -> equi saliency; cp360_tpu/pipelines/extract.py)
end-to-end per frame: host->device transfer of the 960x1920 RGB frame, the
compute graph, and device->host fetch of the [6,7,7,1000] CAM cube + saliency
map — i.e. everything the extraction pipeline does per frame except video
decode and optical flow (excluded on both sides).

Baseline: the reference's per-frame path on torch-CPU (PIL resize +
cv2.remap equi->cube + cubic ResNet-50 forward + NumPy CAM matmul), measured
by tools/measure_torch_baseline.py and recorded in BENCH_BASELINE.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.pipelines.extract import host_equi_to_cube_u8, stage1_batch_faces

    # batch 16 measured best through this host's transfer tunnel: 22.8 vs
    # 19.6 fps at 8 (spike amortization) and 15.8 at 32 (flow-control wall)
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    n_warm = int(os.environ.get("BENCH_WARMUP", "2"))
    n_meas = int(os.environ.get("BENCH_BATCHES", "8"))
    # soft wall-clock budget: the transfer tunnel intermittently degrades
    # 20-100x; report the median of whatever completed rather than nothing
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "420"))

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet50")
    params = jax.device_put(params)

    rng = np.random.RandomState(0)
    # distinct uint8 frame batches per iteration (the transfer tunnel here
    # content-dedups repeated buffers, which would inflate fps)
    batches = [
        (rng.rand(batch, 960, 1920, 3) * 255).astype(np.uint8)
        for _ in range(n_warm + n_meas)
    ]

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=4)

    def remap(i):
        # host cube sampling, prefetched like the production pipeline
        # (pipelines/extract.py submits per-frame remaps at decode time)
        return [pool.submit(host_equi_to_cube_u8, f, 224) for f in batches[i]]

    def run(futs):
        faces = np.stack([f.result() for f in futs])
        scores, sal = stage1_batch_faces(
            params, jnp.asarray(faces), arch="resnet50", use_cube_pad=True,
            compute_dtype=jnp.bfloat16, out_dtype=jnp.float16,
        )
        return scores, sal

    t_start = time.time()  # budget covers warmup/compile too — a degraded
    # tunnel can eat the harness timeout before measurement even begins

    # warmup / compile
    for i in range(n_warm):
        out = run(remap(i))
    jax.device_get(out)

    # steady state, 1-deep pipeline: batch i+1's remap runs while batch i
    # transfers/computes and batch i-1 fetches. Median per-batch time —
    # the transfer relay has rare multi-second latency spikes unrelated to
    # the workload.
    times = []
    pending = None
    futs = remap(n_warm)
    t_prev = time.time()
    for i in range(n_warm, n_warm + n_meas):
        nxt = remap(i + 1) if i + 1 < n_warm + n_meas else None
        out = run(futs)
        futs = nxt
        if pending is not None:
            jax.device_get(pending)
        pending = out
        now = time.time()
        times.append(now - t_prev)
        t_prev = now
        if now - t_start > budget_s and len(times) >= 2:
            break  # degraded link: report what completed
    jax.device_get(pending)
    pool.shutdown(wait=False)
    fps = batch / float(np.median(times))
    # spread over completed iterations — the tunnel's documented variance
    # (CLAUDE.md) makes a single number misleading; docs must quote the
    # driver-captured artifact, median AND spread
    fps_min = batch / float(np.max(times))
    fps_max = batch / float(np.min(times))

    baseline_fps = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline_fps = json.load(f).get("torch_cpu_fps")

    result = {
        "metric": "stage1_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s (equi 960x1920 -> CAM cube + saliency, 1 chip)",
        "vs_baseline": round(fps / baseline_fps, 2) if baseline_fps else None,
        "spread": [round(fps_min, 3), round(fps_max, 3)],
        "n_iters": len(times),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
