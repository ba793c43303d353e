"""Stage-2 (ConvLSTM window inference) throughput on the real chip.

Not the driver's headline metric (bench.py measures stage 1, the
FLOP-dominant path); this records the temporal model's windows/sec for the
docs.  The reference recomputes each stride-1 window serially on GPU; we
batch windows (identical results, tested in tests/test_pipeline.py).

Usage: python tools/bench_stage2.py [batch_windows]
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
    from cp360_tpu.pipelines.temporal import window_infer_from_frames

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    params = jax.device_put(init_clstm_params(jax.random.PRNGKey(0), 1000, 1000))
    rng = np.random.RandomState(0)
    n_meas = 8
    # distinct f16 frame ranges per iteration (the tunnel dedups repeats)
    host_batches = [
        rng.rand(batch + 4, 6, 7, 7, 1000).astype(np.float16)
        for _ in range(n_meas + 1)
    ]
    positions = jnp.arange(batch, dtype=jnp.int32)

    def measure(device_resident):
        if device_resident:
            batches = [jnp.asarray(b) for b in host_batches]
            jax.block_until_ready(batches)
        else:
            batches = host_batches  # upload happens inside the timed loop
        out = window_infer_from_frames(params, jnp.asarray(batches[-1]), positions)
        np.asarray(out)
        times = []
        pending = None
        t_prev = time.time()
        for i in range(n_meas):
            out = window_infer_from_frames(params, jnp.asarray(batches[i]), positions)
            if pending is not None:
                np.asarray(pending)
            pending = out
            now = time.time()
            times.append(now - t_prev)
            t_prev = now
        np.asarray(pending)
        return batch / float(np.median(times))

    # device-resident: the streaming/serving case — CAM cubes are already on
    # the chip (pipelines/stream.py), only the [B,14,28] maps come back.
    wps_dev = measure(device_resident=True)
    # host-fed: each f16 frame range crosses the host->device link inside
    # the loop (~40 MB/batch on this tunnel), serialized with compute.
    wps_host = measure(device_resident=False)

    # the REAL offline path: .npy artifacts on disk -> infer_video (native
    # batch loader + one-deep disk/transfer prefetch overlapping compute).
    import shutil
    import tempfile

    from cp360_tpu.pipelines.temporal import infer_video

    tmp = tempfile.mkdtemp(prefix="bench_s2_")
    feat_dir = os.path.join(tmp, "cube_feat")
    os.makedirs(feat_dir)
    n_frames = 8 * batch + 4
    for k in range(2, n_frames + 2):
        np.save(os.path.join(feat_dir, f"{k:06}.npy"),
                rng.rand(6, 1000, 7, 7).astype(np.float16))
    pipe = {}
    try:
        # exact f16 upload vs the int8 transfer codec (ops/quantize.py:
        # half the link bytes on the H2D-bound disk path; same disk format)
        for codec in ("none", "int8"):
            for bw in (batch, batch // 2):
                # first pass warms the jit cache (compile would otherwise
                # pollute the timing); second pass is the measurement
                infer_video(params, feat_dir, 5, batch_windows=bw,
                            transfer_codec=codec)
                t0 = time.time()
                preds = infer_video(params, feat_dir, 5, batch_windows=bw,
                                    transfer_codec=codec)
                n_win = len(preds)
                pipe[(codec, bw)] = n_win / (time.time() - t0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    pipe_str = ", ".join(
        f"{w:.1f} windows/s infer_video@bw{bw}/{codec}"
        for (codec, bw), w in pipe.items())
    print(
        f"stage2 window_infer at batch {batch}: "
        f"{wps_dev:.1f} windows/s device-resident (streaming), "
        f"{wps_host:.1f} windows/s host-fed unpipelined, "
        f"{pipe_str} (full disk-artifact path, {n_win} windows; "
        f"windows/s == frames/s of the stride-1 protocol)"
    )
    import json

    print(json.dumps({
        "metric": "stage2_windows_per_sec", "unit": "windows/s",
        "value": round(max(pipe.values()), 1),  # best disk-path config
        "device_resident": round(wps_dev, 1),
        "host_fed": round(wps_host, 1),
        "disk_path": {f"{c}@bw{bw}": round(w, 1)
                      for (c, bw), w in pipe.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
