"""Measure the TPU tunnel's link rates and derive the stage-1 fps ceiling.

VERDICT r3 #4: PARITY needs a measured budget table — bytes/frame by
stream x measured link MB/s -> predicted fps, next to achieved fps — so
the transfer wall is derived, not asserted.  Reference analogue: the wall
replacing dataset_feat_extractor.py:151-192's local-PCIe assumption.

Measures, with distinct data per buffer (the tunnel content-dedups) and
chained timing (block_until_ready lies through the relay — CLAUDE.md):

  1. H2D MB/s — uint8 buffers device_put + consumed by a trivial jitted
     sum (device_put is deferred; bytes cross when the consumer runs);
  2. D2H MB/s — device-generated uint8 buffers fetched via async copies;
  3. duplex — the bench's actual steady-state pattern (upload batch i,
     fetch batch i-1's results) with stage-1-shaped streams.

Then prints the budget table: per-frame bytes of each stream at the
default bench config (yuv420 upload, int8+scales+saliency down) and the
predicted pipelined fps = min(h2d_rate/h2d_bytes, d2h_rate/d2h_bytes)
using the DUPLEX rates, vs the achieved number of record.

Usage: timeout 590 python tools/measure_link.py [mb_per_dir=8] [n_iters=6]
Prints one JSON line.  Run ONE process at a time (concurrent axon clients
wedge each other).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    size = int(mb * 1e6)

    @jax.jit
    def consume(x):
        # force the (deferred) upload to actually cross; negligible compute
        return jnp.sum(x[::4096].astype(jnp.int32))

    @jax.jit
    def gen(k):
        return jax.random.randint(k, (size,), 0, 256, jnp.uint8)

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(7)

    # warm both graphs + the link
    acc = consume(jax.device_put(
        (rng.rand(size) * 255).astype(np.uint8))) + consume(gen(key))
    float(acc)

    # --- 1. H2D-only ------------------------------------------------------
    bufs = [(rng.rand(size) * 255).astype(np.uint8) for _ in range(n_iters)]
    acc = jnp.zeros((), jnp.int32)
    t0 = time.time()
    for b in bufs:
        acc = acc + consume(jax.device_put(b))
    float(acc)
    h2d = size * n_iters / (time.time() - t0) / 1e6
    print(f"link: h2d {h2d:.1f} MB/s", file=sys.stderr, flush=True)

    # --- 2. D2H-only ------------------------------------------------------
    devs = [gen(jax.random.fold_in(key, i)) for i in range(n_iters)]
    float(jnp.sum(devs[-1][:1]))  # materialize generation before timing
    t0 = time.time()
    for d in devs:
        d.copy_to_host_async()
    got = [np.asarray(d) for d in devs]
    d2h = size * n_iters / (time.time() - t0) / 1e6
    assert all(g.size == size for g in got)
    print(f"link: d2h {d2h:.1f} MB/s", file=sys.stderr, flush=True)

    # --- 3. duplex (the bench's steady-state pattern) ----------------------
    # stage-1-shaped per-iteration streams at batch 16: up ~7 MB of faces,
    # down ~5 MB of CAM+scales+saliency
    up_bufs = [(rng.rand(size) * 255).astype(np.uint8) for _ in range(n_iters)]
    down_devs = [gen(jax.random.fold_in(key, 100 + i)) for i in range(n_iters)]
    float(jnp.sum(down_devs[-1][:1]))
    acc = jnp.zeros((), jnp.int32)
    pending = None
    t0 = time.time()
    for i in range(n_iters):
        acc = acc + consume(jax.device_put(up_bufs[i]))
        down_devs[i].copy_to_host_async()
        if pending is not None:
            np.asarray(pending)
        pending = down_devs[i]
    np.asarray(pending)
    float(acc)
    dt = time.time() - t0
    dup_each = size * n_iters / dt / 1e6  # per-direction rate under duplex
    print(f"link: duplex {dup_each:.1f} MB/s each way "
          f"({2*dup_each:.1f} total)", file=sys.stderr, flush=True)

    # --- budget table -------------------------------------------------------
    cd = 224
    h2d_frame = 6 * cd * cd + 6 * (cd // 2) * (cd // 2) * 2  # yuv420 u8
    q_frame = 6 * 7 * 7 * 1000                               # int8 CAM
    scales_f32 = 6 * 1000 * 4
    scales_f16 = 6 * 1000 * 2
    sal_frame = (2 * 7) * (4 * 7) * 4                        # f32 saliency
    d2h_frame = q_frame + scales_f32 + sal_frame
    d2h_frame_f16s = q_frame + scales_f16 + sal_frame

    def pred(h2d_b, d2h_b):
        return min(dup_each * 1e6 / h2d_b, dup_each * 1e6 / d2h_b)

    result = {
        "metric": "link_budget",
        "h2d_MBps": round(h2d, 1),
        "d2h_MBps": round(d2h, 1),
        "duplex_MBps_each": round(dup_each, 1),
        "bytes_per_frame": {
            "h2d_yuv420": h2d_frame,
            "d2h_int8_cam": q_frame,
            "d2h_scales_f32": scales_f32,
            "d2h_scales_f16": scales_f16,
            "d2h_saliency": sal_frame,
        },
        "predicted_fps": round(pred(h2d_frame, d2h_frame), 1),
        "predicted_fps_f16_scales": round(pred(h2d_frame, d2h_frame_f16s), 1),
        "buffer_mb": mb,
        "n_iters": n_iters,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
