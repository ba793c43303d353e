"""Device->host fetch helpers.

On this host's TPU transfer tunnel a plain ``np.asarray(device_array)``
fetch measures ~1.3 MB/s (each chunk pays a synchronous round trip), while
enqueueing ``copy_to_host_async`` first and materializing afterwards runs
~29 MB/s — a 20x difference on the exact same bytes.  Every production
fetch goes through :func:`fetch_np` so the async enqueue is never
forgotten.  (No reference analogue — torch .cpu() has no such trap.)
"""

from __future__ import annotations

import os
import time

import numpy as np


def warm_link(verbose: bool = True, heartbeat_s: float = 60.0) -> float:
    """Absorb the tunnel's per-process cold-fetch wedge; return its seconds.

    Measured 2026-08-19 (degraded-tunnel phase): the FIRST device->host
    fetch of a fresh process wedges 100-420 s, after which every fetch in
    the same process is normal (~0.03 s for 64 values).  Any tool that
    *times* transfers or serves latency-sensitive traffic must call this
    once at startup so the wedge lands outside the timed section.  Runs a
    tiny distinct-data matmul (the tunnel content-dedups repeated buffers)
    and fetches 8x8 of the result; no-op cost (~1 s) on a healthy tunnel
    or on CPU.  (No reference analogue — a PCIe host has no relay.)

    While the fetch is in flight a daemon thread prints a heartbeat every
    ``heartbeat_s`` — a `--supervise`d CLI would otherwise look stalled
    during a cold fetch longer than the supervisor's timeout (the
    supervisor counts child output as progress, utils/supervise.py) and
    get restart-looped, paying the cold fetch again each time.
    """
    import threading

    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(os.getpid() & 0x7FFFFFFF)
    x = jnp.asarray(rs.rand(256, 256), jnp.bfloat16)
    t0 = time.time()
    done = threading.Event()

    def beat():
        while not done.wait(heartbeat_s):
            print(f"warm_link: transfer path still warming "
                  f"({time.time() - t0:.0f}s — degraded-tunnel cold fetch, "
                  f"see RUNBOOK.md)", flush=True)

    hb = None
    if verbose and heartbeat_s > 0:
        hb = threading.Thread(target=beat, daemon=True)
        hb.start()
    try:
        y = (x @ x).block_until_ready()
        np.asarray(y[:8, :8])
    finally:
        done.set()
    dt = time.time() - t0
    if verbose and dt > 5.0:
        print(f"warm_link: absorbed a {dt:.0f}s cold first-fetch "
              f"(degraded-tunnel phase; see RUNBOOK.md)", flush=True)
    return dt


def async_start(*arrays) -> None:
    """Enqueue D2H copies for all arrays (no-op for host/numpy values)."""
    for a in arrays:
        start = getattr(a, "copy_to_host_async", None)
        if start is not None:
            try:
                start()
            except Exception:
                pass  # committed-to-host or deleted arrays


def fetch_np(*arrays):
    """Fetch device arrays to numpy with the async-enqueue fast path.

    Returns a single ndarray for one argument, else a tuple of ndarrays.
    """
    async_start(*arrays)
    out = tuple(np.asarray(a) for a in arrays)
    return out[0] if len(out) == 1 else out
