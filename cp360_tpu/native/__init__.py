"""ctypes bindings for the native batch .npy loader.

Compiled on first use with g++ (cached next to the source).  Falls back
cleanly: callers should catch ImportError/OSError and use numpy loading.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "npy_loader.cpp")
_SO = os.path.join(_HERE, "libnpy_loader.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    # pid-unique temp: two processes racing the first build must not
    # interleave g++ output into one file; os.replace keeps the install
    # atomic either way (last writer wins with a complete .so).
    tmp = f"{_SO}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def get_lib():
    """Load (building if needed) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # A corrupt cached .so is newer than the source so the mtime
            # check never fires — rebuild once before giving up.
            _build()
            lib = ctypes.CDLL(_SO)
        lib.npy_payload_bytes.restype = ctypes.c_uint64
        lib.npy_payload_bytes.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.npy_load_batch.restype = ctypes.c_int
        lib.npy_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        _lib = lib
        return lib


def load_npy_batch(
    paths: Sequence[str],
    shape: tuple,
    dtype,
    n_threads: int = 0,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Read a batch of same-shaped .npy files into one [N, *shape] array.

    All files must be C-order with identical dtype/shape (validated by
    payload size; shape/dtype themselves come from the caller, typically
    np.load of the first file once).  Releases the GIL for the whole batch.
    """
    lib = get_lib()
    n = len(paths)
    dtype = np.dtype(dtype)
    item_bytes = int(np.prod(shape)) * dtype.itemsize
    if out is None:
        out = np.empty((n, *shape), dtype)
    else:
        assert out.shape == (n, *shape) and out.dtype == dtype and out.flags.c_contiguous

    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    err = ctypes.create_string_buffer(512)
    rc = lib.npy_load_batch(
        arr, n, out.ctypes.data_as(ctypes.c_char_p), item_bytes, n_threads, err, 512
    )
    if rc != 0:
        raise IOError(f"npy_load_batch failed on {paths[rc - 1]}: {err.value.decode()}")
    return out


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False
