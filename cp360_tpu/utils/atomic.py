"""Crash-atomic numpy file writes for resumable pipelines.

Every resumable surface here (extraction per frame, stage-2 eval per
video, streaming per map) treats an EXISTING file as a completed unit of
work, and the restart-on-stall supervisor (utils/supervise.py) kills
children with SIGKILL after the grace window — so a write interrupted
mid-``np.save`` must never leave a truncated file under the final name
(a later ``--resume`` would either skip the corrupt unit forever or crash
loading it).  Write to a same-directory ``*.tmp`` name, then
``os.replace`` (atomic on POSIX).

The temp name deliberately does NOT carry the .npy/.npz extension (numpy
is handed an open file object, which skips its suffix-appending): artifact
listers select on ``endswith(".npy")``, and a stale temp from a crashed
run must never be listed as a frame.  A stale ``*.tmp`` is harmless and
self-cleaning — the final artifact is missing, so resume regenerates it
through the same temp name and the replace removes it.
"""

from __future__ import annotations

import os

import numpy as np


def atomic_save(path: str, arr) -> None:
    """``np.save(path, arr)`` that lands atomically (path must end .npy)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


def atomic_savez(path: str, **arrays) -> None:
    """``np.savez(path, **arrays)`` that lands atomically (path ends .npz)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def atomic_savez_compressed(path: str, **arrays) -> None:
    """Atomic ``np.savez_compressed`` — checkpoints especially must never
    be torn: overwriting train_state_latest.npz in place would destroy the
    previous good state BEFORE the new one is durable."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)
