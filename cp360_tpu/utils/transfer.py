"""Device->host fetch helpers.

On this host's TPU transfer tunnel a plain ``np.asarray(device_array)``
fetch measures ~1.3 MB/s (each chunk pays a synchronous round trip), while
enqueueing ``copy_to_host_async`` first and materializing afterwards runs
~29 MB/s — a 20x difference on the exact same bytes.  Every production
fetch goes through :func:`fetch_np` so the async enqueue is never
forgotten.  (No reference analogue — torch .cpu() has no such trap.)
"""

from __future__ import annotations

import numpy as np


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
