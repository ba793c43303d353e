"""Measure the transfer link's current phase and adapt transfer config.

The tunnel on this class of host has three measured phases (RUNBOOK.md):
healthy (~31 MB/s duplex), degraded (~7-8 MB/s plus a 100-420 s cold
first fetch), and full outage (backend init hangs).  Round 4 built the
measurement tools (tools/measure_link.py, transfer.warm_link) but
production ignored them — codec/depth were static and the bench retry
ladder keyed on a fixed fps floor (VERDICT r4 weak #3 / next #4).  This
module is the adaptive half: a bounded in-process probe plus the budget
model, so pipelines can pick ``transfer_codec`` (and benches their retry
floor) from the link they actually have, not the link the defaults
assumed.

Reference analogue: none — the reference assumes local PCIe
(static_model/dataset_feat_extractor.py:151-192); the probe/model replaces
that assumption with a measurement.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, asdict

import numpy as np

from cp360_tpu.utils.transfer import warm_link

# duplex rate below which the link — not device compute — is plainly the
# binding constraint for stage 1 at any realistic device rate (the healthy
# phase measures ~31 MB/s; degraded ~7.6; a real PCIe host >1000)
DEGRADED_MBPS = 20.0


@dataclass
class LinkProbe:
    cold_s: float          # absorbed cold-first-fetch seconds (warm_link)
    duplex_MBps: float     # per-direction rate under the duplex pattern
    probe_s: float         # wall time the probe itself took
    phase: str             # 'healthy' | 'degraded'

    def to_json(self) -> str:
        return json.dumps(asdict(self))


def probe_link(mb: float = 4.0, n_iters: int = 3, verbose: bool = True) -> LinkProbe:
    """Bounded link measurement: warm the cold fetch, then time a small
    duplex transfer (distinct data per buffer — the relay content-dedups;
    timing chained through consuming compute — block_until_ready lies).

    Runs IN-PROCESS: call once at pipeline startup, before any timed or
    latency-sensitive device work.  Cost: ~2 s healthy, ~cold_s + ~7 s
    degraded.  On CPU platforms returns a synthetic 'healthy' probe.
    """
    import jax
    import jax.numpy as jnp

    t_all = time.time()
    if jax.devices()[0].platform == "cpu":
        return LinkProbe(0.0, float("inf"), 0.0, "healthy")

    cold_s = warm_link(verbose=verbose)

    size = int(mb * 1e6)
    rng = np.random.RandomState(os.getpid() & 0x7FFFFFFF)

    @jax.jit
    def consume(x):
        return jnp.sum(x[::4096].astype(jnp.int32))

    @jax.jit
    def gen(k):
        return jax.random.randint(k, (size,), 0, 256, jnp.uint8)

    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    # warm both graphs outside the timing
    float(consume(jax.device_put((rng.rand(1024) * 255).astype(np.uint8))
                  [: 1024]) + jnp.sum(gen(key)[:8].astype(jnp.int32)))

    up = [(rng.rand(size) * 255).astype(np.uint8) for _ in range(n_iters)]
    down = [gen(jax.random.fold_in(key, i)) for i in range(n_iters)]
    float(jnp.sum(down[-1][:1].astype(jnp.int32)))  # materialize generation

    acc = jnp.zeros((), jnp.int32)
    pending = None
    t0 = time.time()
    for i in range(n_iters):
        acc = acc + consume(jax.device_put(up[i]))
        down[i].copy_to_host_async()
        if pending is not None:
            np.asarray(pending)
        pending = down[i]
    np.asarray(pending)
    float(acc)
    duplex = size * n_iters / (time.time() - t0) / 1e6
    phase = "degraded" if duplex < DEGRADED_MBPS else "healthy"
    return LinkProbe(round(cold_s, 1), round(duplex, 1),
                     round(time.time() - t_all, 1), phase)


def stage1_bytes_per_frame(codec: str, upload_format: str = "yuv420",
                           cube_dim: int = 224, num_classes: int = 1000,
                           feat_hw: int = 7) -> tuple:
    """(h2d_bytes, d2h_bytes) per frame for the stage-1 pipeline at a codec.

    Streams (PARITY.md link-budget table): up the 6 faces (u8 yuv420 or
    rgb), down the CAM cube ([6, feat, feat, classes]) + saliency map.
    """
    if upload_format == "yuv420":
        h2d = 6 * cube_dim * cube_dim + 6 * (cube_dim // 2) ** 2 * 2
    else:
        h2d = 6 * cube_dim * cube_dim * 3
    cam = 6 * feat_hw * feat_hw * num_classes
    sal = (2 * feat_hw) * (4 * feat_hw) * 4
    if codec == "int8":
        d2h = cam + 6 * num_classes * 2 + sal  # int8 planes + f16 scales
    else:
        d2h = cam * 2 + sal  # f16 artifact planes
    return h2d, d2h


def predict_stage1_fps(duplex_MBps: float, codec: str,
                       upload_format: str = "yuv420", **kw) -> float:
    """Link-model fps ceiling: each direction runs at the duplex rate."""
    h2d, d2h = stage1_bytes_per_frame(codec, upload_format, **kw)
    if not np.isfinite(duplex_MBps):
        return float("inf")
    return min(duplex_MBps * 1e6 / h2d, duplex_MBps * 1e6 / d2h)


def resolve_codec(codec: str, probe: LinkProbe | None,
                  device_fps_hint: float = 700.0,
                  upload_format: str = "yuv420", **kw) -> str:
    """Resolve ``transfer_codec: auto`` against a measured link.

    Rule: ship int8 iff the link (not device compute) is the binding
    constraint — predicted exact-codec link fps below the device rate the
    chip demonstrably sustains (BENCH_r04 device_fps 706.7; overridable
    via ``device_fps_hint``).  On a real PCIe host the exact codec always
    wins (no link wall, full-fidelity artifact); through this relay int8
    is the measured +16-25% lever with a tested error bound
    (tests/test_quantize.py).
    """
    if codec != "auto":
        return codec
    if probe is None:
        return "none"
    exact_fps = predict_stage1_fps(probe.duplex_MBps, "none",
                                   upload_format, **kw)
    return "int8" if exact_fps < device_fps_hint else "none"
