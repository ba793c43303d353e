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
    # distinct f16 frame ranges per iteration (the tunnel dedups repeats);
    # frames transfer once each, windows assemble on device.
    frame_batches = [
        jnp.asarray(rng.rand(batch + 4, 6, 7, 7, 1000), jnp.float16)
        for _ in range(n_meas + 1)
    ]
    positions = jnp.arange(batch, dtype=jnp.int32)

    out = window_infer_from_frames(params, frame_batches[-1], positions)
    np.asarray(out)

    times = []
    pending = None
    t_prev = time.time()
    for i in range(n_meas):
        out = window_infer_from_frames(params, frame_batches[i], positions)
        if pending is not None:
            np.asarray(pending)
        pending = out
        now = time.time()
        times.append(now - t_prev)
        t_prev = now
    np.asarray(pending)
    wps = batch / float(np.median(times))
    print(
        f"stage2 window_infer: {wps:.1f} windows/s at batch {batch} "
        f"(= {wps:.1f} frames/s of the stride-1 eval protocol)"
    )


if __name__ == "__main__":
    main()
