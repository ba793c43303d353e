"""Optical flow: host OpenCV path + a TPU-native JAX pyramidal solver.

The reference wraps OpenCV-contrib DeepFlow (utils/optical_flow.py:24-29),
which is not available in this OpenCV build (no cv2.optflow).  We provide:

1. ``calc_optical_flow`` — host path with the same pre/post-processing as
   the reference wrapper (LANCZOS resize to (960, 480), channel reversal +
   BGR2GRAY, min-max-normalized magnitude with < mean-1.5*std zeroed,
   utils/optical_flow.py:18-38), using Farneback — the reference's own
   commented-in-source alternative (utils/optical_flow.py:32).
2. ``horn_schunck_flow`` — a multi-scale Horn-Schunck solver in pure JAX
   (lax.fori_loop Jacobi iterations over an image pyramid) so flow can run
   on the TPU next to the CNN instead of stalling the pipeline on host CPU
   (the reference's #3 hot spot, SURVEY.md §3.1).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False

_FARNEBACK_PARAMS = dict(
    pyr_scale=0.5, levels=7, winsize=15, iterations=3, poly_n=5, poly_sigma=1.2, flags=0
)


def _postprocess_magnitude(flow: np.ndarray) -> np.ndarray:
    absflow = np.sqrt(flow[:, :, 0] ** 2 + flow[:, :, 1] ** 2)
    absflow = absflow - absflow.min()
    mx = absflow.max()
    if mx > 0:
        absflow = absflow / mx
    absflow[absflow < (absflow.mean() - 1.5 * absflow.std())] = 0
    return absflow


def calc_optical_flow(
    prev_frame: np.ndarray, cur_frame: np.ndarray, res: Tuple[int, int] = (960, 480)
) -> Tuple[np.ndarray, np.ndarray]:
    """Flow between two BGR frames at ``res`` = (width, height).

    Returns (absflow [H,W], flow [H,W,2]) like the reference wrapper
    (utils/optical_flow.py:7-39).  Backend: DeepFlow if this cv2 has
    contrib optflow, else Farneback (documented divergence — flow only
    feeds the training losses, not the published eval protocol).
    """
    if not _HAVE_CV2:
        raise RuntimeError("cv2 unavailable; use horn_schunck_flow for the device path")

    prev = cv2.resize(prev_frame[..., ::-1], res, interpolation=cv2.INTER_LANCZOS4)
    cur = cv2.resize(cur_frame[..., ::-1], res, interpolation=cv2.INTER_LANCZOS4)
    prev = cv2.cvtColor(prev, cv2.COLOR_BGR2GRAY)
    cur = cv2.cvtColor(cur, cv2.COLOR_BGR2GRAY)

    if hasattr(cv2, "optflow") and hasattr(cv2.optflow, "createOptFlow_DeepFlow"):
        df = cv2.optflow.createOptFlow_DeepFlow()
        flow = df.calc(prev, cur, np.zeros((*prev.shape, 2), np.float32))
    else:
        p = _FARNEBACK_PARAMS
        flow = cv2.calcOpticalFlowFarneback(
            prev, cur, None, p["pyr_scale"], p["levels"], p["winsize"],
            p["iterations"], p["poly_n"], p["poly_sigma"], p["flags"],
        )

    return _postprocess_magnitude(flow), flow


# ---------------------------------------------------------------------------
# TPU-native multi-scale Horn-Schunck
# ---------------------------------------------------------------------------

_HS_KERNEL = jnp.array(
    [[1 / 12, 1 / 6, 1 / 12], [1 / 6, 0.0, 1 / 6], [1 / 12, 1 / 6, 1 / 12]],
    dtype=jnp.float32,
)


def _avg_neighbors(u: jax.Array) -> jax.Array:
    """Weighted neighborhood average (Horn-Schunck Laplacian surrogate)."""
    up = jnp.pad(u, ((1, 1), (1, 1)), mode="edge")
    k = _HS_KERNEL
    return (
        jax.lax.conv_general_dilated(
            up[None, :, :, None],
            k[:, :, None, None],
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]
    )


def _hs_single_scale(i1, i2, u, v, alpha, iters):
    ix = (jnp.roll(i1, -1, 1) - jnp.roll(i1, 1, 1)) * 0.5
    iy = (jnp.roll(i1, -1, 0) - jnp.roll(i1, 1, 0)) * 0.5
    it = i2 - i1

    def body(_, uv):
        u, v = uv
        ubar = _avg_neighbors(u)
        vbar = _avg_neighbors(v)
        num = ix * ubar + iy * vbar + it
        den = alpha**2 + ix**2 + iy**2
        u = ubar - ix * num / den
        v = vbar - iy * num / den
        return (u, v)

    return jax.lax.fori_loop(0, iters, body, (u, v))


def _downsample2(img: jax.Array) -> jax.Array:
    h, w = img.shape
    return img[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2).mean((1, 3))


def _upsample2(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    from cp360_tpu.ops.resample import resize_bilinear

    return resize_bilinear(img[None, :, :, None], out_h, out_w)[0, :, :, 0]


@partial(jax.jit, static_argnames=("levels", "iters"))
def horn_schunck_flow(
    prev_gray: jax.Array,
    cur_gray: jax.Array,
    alpha: float = 0.5,
    levels: int = 4,
    iters: int = 60,
) -> jax.Array:
    """Dense flow [H, W, 2] (dx, dy) between two grayscale images on device.

    Coarse-to-fine Horn-Schunck: solve at the coarsest pyramid level, 2x
    upsample the flow (values doubled) as the next level's init.

    ``alpha`` is the smoothness weight in *intensity units*: ~0.5 suits
    [0, 1]-scaled images; scale it by 255 for uint8-range inputs.
    """
    i1 = prev_gray.astype(jnp.float32)
    i2 = cur_gray.astype(jnp.float32)
    pyr = [(i1, i2)]
    for _ in range(levels - 1):
        i1 = _downsample2(i1)
        i2 = _downsample2(i2)
        pyr.append((i1, i2))

    u = jnp.zeros_like(pyr[-1][0])
    v = jnp.zeros_like(pyr[-1][0])
    for li in range(levels - 1, -1, -1):
        a, b = pyr[li]
        if u.shape != a.shape:
            u = _upsample2(u, *a.shape) * 2.0
            v = _upsample2(v, *a.shape) * 2.0
        # warp b toward a by current flow before refining
        if li < levels - 1:
            b = _warp_gray(b, u, v)
            du, dv = _hs_single_scale(a, b, jnp.zeros_like(u), jnp.zeros_like(v), alpha, iters)
            u = u + du
            v = v + dv
        else:
            u, v = _hs_single_scale(a, b, u, v, alpha, iters)
    return jnp.stack([u, v], axis=-1)


def _warp_gray(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    from cp360_tpu.ops.resample import grid_sample

    h, w = img.shape
    gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    nx = 2.0 * (gx + u) / (w - 1) - 1.0
    ny = 2.0 * (gy + v) / (h - 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)[None]
    return grid_sample(img[None, :, :, None], grid)[0, :, :, 0]


def calc_optical_flow_device(
    prev_frame: np.ndarray, cur_frame: np.ndarray, res: Tuple[int, int] = (960, 480)
) -> Tuple[np.ndarray, np.ndarray]:
    """Device-path drop-in for :func:`calc_optical_flow` (same signature).

    Host does only the resize+grayscale (matching the reference's
    preprocessing); the flow itself is the TPU Horn-Schunck solver.  Selected
    with config ``flow_backend: horn_schunck``.
    """
    import jax.numpy as jnp_

    if _HAVE_CV2:
        prev = cv2.resize(prev_frame[..., ::-1], res, interpolation=cv2.INTER_LANCZOS4)
        cur = cv2.resize(cur_frame[..., ::-1], res, interpolation=cv2.INTER_LANCZOS4)
        prev = cv2.cvtColor(prev, cv2.COLOR_BGR2GRAY)
        cur = cv2.cvtColor(cur, cv2.COLOR_BGR2GRAY)
    else:  # plain luma fallback
        from PIL import Image

        prev = np.asarray(Image.fromarray(prev_frame[..., ::-1]).convert("L").resize(res))
        cur = np.asarray(Image.fromarray(cur_frame[..., ::-1]).convert("L").resize(res))

    flow = np.asarray(
        horn_schunck_flow(
            jnp_.asarray(prev, jnp_.float32) / 255.0,
            jnp_.asarray(cur, jnp_.float32) / 255.0,
        )
    )
    return _postprocess_magnitude(flow), flow


def get_flow_fn(backend: str = "farneback"):
    """Flow backend selector: 'farneback' (host cv2), 'horn_schunck' (TPU),
    'deepflow' (host cv2-contrib, if present)."""
    if backend == "horn_schunck":
        return calc_optical_flow_device
    if backend in ("farneback", "deepflow"):
        return calc_optical_flow
    raise ValueError(f"unknown flow backend {backend!r}")
