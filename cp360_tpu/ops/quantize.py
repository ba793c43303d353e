"""Transfer-layer int8 codec for CAM feature planes.

Both artifact flows are link-bound on this host (PARITY.md): stage-1
fetches a [6, 7, 7, 1000] f16 CAM cube per frame (~588 KB — the dominant
D2H stream), and the stage-2 disk path re-uploads the same planes
(~0.63 MB/window H2D).  A per-(face, channel) symmetric int8 quantization
halves those bytes: scale_c = amax_c / 127 over the 7x7 plane, so the
worst-case error is amax_c / 254 ~= 0.4% of the channel's own peak — the
same order as the bf16 compute noise already accepted upstream (the convs
producing these features run with 8-bit-mantissa bf16 inputs).

This is purely a TRANSFER codec, gated by config ``transfer_codec: int8``:
the on-disk artifact format (f16/f32 ``.npy`` in the reference's
[6, 1000, 7, 7] layout) is unchanged — stage 1 dequantizes on host before
writing, stage 2 quantizes on host after reading and dequantizes in-graph
on device.  No reference analogue: the reference moves f32 tensors over
local PCIe (static_model/dataset_feat_extractor.py:151-170) where the link
never dominates; here the ~31 MB/s tunnel is the measured wall.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Quantized(NamedTuple):
    """A quantized plane batch travelling host->device as a pytree.

    Jit-transparent: pass one of these anywhere an array batch is expected
    and let the consumer call :func:`maybe_dequantize` — jax treats the
    NamedTuple as a pytree, so jitted steps retrace (once) on the structure
    change and the int8 planes + tiny scales are what actually cross the
    link.  Used by the training loader for both CAM windows and flow
    fields (the flows are the dominant training H2D: f32 [480,960,2] is
    ~18.4 MB/window vs ~2.9 MB of f16 CAM features).
    """

    q: Any       # int8 planes [..., h, w, C]
    scales: Any  # f32 [..., 1, 1, C]

# quantization grid: symmetric, zero-preserving (0.0 -> 0 -> 0.0 exactly;
# CAM planes are ReLU-adjacent and zero-heavy, so exact zeros matter)
_QMAX = 127.0
# scale = amax * (1/127), as an explicit reciprocal multiply: XLA rewrites
# division by a constant into exactly this, so spelling it out keeps the
# host (numpy) and device (jit) quantizers bit-identical
_INV_QMAX = np.float32(1.0) / np.float32(_QMAX)


def quantize_cam(x: jax.Array, scale_dtype=jnp.float32):
    """Quantize feature planes per (…, channel): [..., h, w, C] float ->
    (q int8 [..., h, w, C], scales ``scale_dtype`` [..., 1, 1, C]).

    Jit-friendly (runs inside the stage-1 device step so only int8 + the
    tiny scale tensor cross D2H).  A constant-zero channel gets scale 1/127
    and quantizes to exact zeros.

    ``scale_dtype=jnp.float16`` halves the scale stream (~3% of the stage-1
    D2H budget — the last cheap link lever, PARITY's budget table): the
    scale is rounded to f16 FIRST and the planes quantize against the
    rounded value, so the codec stays self-consistent — the only effect is
    a ≤2^-11 relative change of the step size, keeping the worst-case error
    at ~amax/253.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(-3, -2), keepdims=True)
    scales = jnp.where(amax > 0.0, amax, 1.0) * _INV_QMAX
    # keep the rounded scale finite in the narrower dtype: an amax outside
    # f16's range would otherwise round the scale to inf (dequantize NaN via
    # 0*inf) or 0 — clamp into the target dtype's finite positive range
    fin = jnp.finfo(scale_dtype)
    scales = jnp.clip(scales, np.float32(fin.smallest_subnormal),
                      np.float32(fin.max)).astype(scale_dtype)
    q = jnp.clip(jnp.round(xf / scales.astype(jnp.float32)),
                 -_QMAX, _QMAX).astype(jnp.int8)
    return q, scales


def dequantize_cam(q: jax.Array, scales: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Inverse of :func:`quantize_cam` (jit-friendly; runs in-graph on the
    stage-2 upload path so only int8 crosses H2D)."""
    return (q.astype(jnp.float32) * scales).astype(dtype)


def maybe_dequantize(x, dtype=jnp.float32) -> jax.Array:
    """Array -> astype(dtype); :class:`Quantized` -> dequantize (in-graph).

    The trace-time isinstance branch lets one jitted step signature accept
    either form without a config plumb-through.
    """
    if isinstance(x, Quantized):
        return dequantize_cam(x.q, x.scales, dtype)
    return x.astype(dtype)


def quantize_cam_np(x: np.ndarray, scale_dtype=np.float32):
    """Host-side :func:`quantize_cam` (same math; used on the stage-2 IO
    thread so quantization overlaps disk reads)."""
    xf = np.asarray(x, dtype=np.float32)
    amax = np.max(np.abs(xf), axis=(-3, -2), keepdims=True)
    scales = np.where(amax > 0.0, amax, 1.0).astype(np.float32) * _INV_QMAX
    fin = np.finfo(scale_dtype)  # finite-range clamp, mirrors quantize_cam
    scales = np.clip(scales, np.float32(fin.smallest_subnormal),
                     np.float32(fin.max)).astype(scale_dtype)
    q = np.clip(np.round(xf / scales.astype(np.float32)),
                -_QMAX, _QMAX).astype(np.int8)
    return q, scales


def dequantize_cam_np(q: np.ndarray, scales: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Host-side :func:`dequantize_cam` (stage-1 writes the usual float
    artifact after fetching int8)."""
    return (q.astype(np.float32) * scales).astype(dtype)
