"""Stage-1 static extraction: video -> per-frame CAM cubes / flow / images.

Capability parity with the reference driver
(static_model/dataset_feat_extractor.py:26-200), re-designed so the device
does everything between "decoded frame" and "saliency map" in ONE fused jit
graph: equi->cube gather, ImageNet normalization, cube-padded ResNet CAM,
cube->equi gather, channel max.  The reference instead ping-pongs
host->device->host->device per frame (SURVEY.md §3.1).

Artifact compatibility (so reference-trained stage-2 consumes our output):
- directory layout <out>/<vid>/{cube_feat,motion,img}/ + overlay jpgs at the
  video root (dataset_feat_extractor.py:102-113,181-192);
- cube_feat .npy in the reference's [6, 1000, 7, 7] layout;
- frame numbering starts at 000002 and the saved content lags the index by
  two video frames, exactly like the reference loop
  (dataset_feat_extractor.py:119-137,193): artifact k holds video frame k-2,
  and motion/k.npy is the flow from frame k-2 to k-1.
"""

from __future__ import annotations

import os
import time
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.config import Config
from cp360_tpu.imaging.overlay import IMAGENET_MEAN, IMAGENET_STD, overlay
from cp360_tpu.utils.atomic import atomic_save
from cp360_tpu.models.cam import cam_forward
from cp360_tpu.ops.resample import cube_to_equi, equi_to_cube
from cp360_tpu.utils.transfer import async_start, fetch_np


@partial(jax.jit, static_argnames=("arch", "use_cube_pad", "compute_dtype", "out_dtype", "codec"))
def stage1_batch_faces(
    params: dict,
    faces_u8: jax.Array,
    arch: str = "resnet50",
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.float16,
    codec: str = "none",
):
    """Fused device step from pre-sampled cube faces (the fast I/O path).

    Args:
      faces_u8: [N, 6, cd, cd, 3] uint8 cube faces (host cv2.remap of the
        decoded frame — see :func:`host_equi_to_cube_u8`).

    Returns (scores [N,6,h,w,1000] out_dtype, sal [N,2h,4w] f32), or with
    ``codec="int8"`` (q int8 [N,6,h,w,1000], scales f32 [N,6,1,1,1000],
    sal) — the transfer-layer codec (ops/quantize.py) that halves the
    dominant D2H stream; the caller dequantizes on host before writing the
    unchanged float artifact.

    Host->device traffic is 6*cd^2*3 bytes/frame (~0.9 MB at 224) instead of
    the full equi frame (~5.5 MB); device->host CAM cubes return in
    ``out_dtype`` (f16 by default — the convs upstream are bf16, so f16
    artifact quantization is below compute noise).
    """
    cubes = faces_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    cubes = (cubes - mean) / std
    scores, _ = _backbone_cam(params, cubes, arch, use_cube_pad, compute_dtype)
    equi_scores = cube_to_equi(scores)  # [N, 2h, 4w, 1000]
    sal = jnp.max(equi_scores, axis=-1) ** 2
    if codec == "int8":
        from cp360_tpu.ops.quantize import quantize_cam

        # f16 scales: transfer-only stream (host dequantizes right after
        # D2H), halves the scale bytes (~3% of the frame's D2H budget —
        # PARITY link-budget table) at <=2^-11 step-size change
        q, scales = quantize_cam(scores, scale_dtype=jnp.float16)
        return q, scales, sal
    return scores.astype(out_dtype), sal


def _backbone_cam(params, cubes, arch, use_cube_pad, compute_dtype):
    """CAM dispatch over backbone families (resnet*/vgg16/mobilenet_v2)."""
    if arch == "vgg16":
        from cp360_tpu.models.vgg import vgg16_cam_forward

        return vgg16_cam_forward(
            params, cubes, use_cube_pad=use_cube_pad, compute_dtype=compute_dtype
        )
    if arch == "mobilenet_v2":
        from cp360_tpu.models.mobilenet import mobilenet_v2_cam_forward

        return mobilenet_v2_cam_forward(
            params, cubes, use_cube_pad=use_cube_pad, compute_dtype=compute_dtype
        )
    return cam_forward(
        params, cubes, arch=arch, use_cube_pad=use_cube_pad,
        compute_dtype=compute_dtype,
    )


def host_equi_to_cube_u8(frame_u8: np.ndarray, cube_dim: int) -> np.ndarray:
    """Host-side equi->cube sampling on the uint8 frame via cv2.remap.

    Uses the same reference-parity sampling maps as the device resampler
    (cp360_tpu.geometry.build_equi2cube_maps).  Output is uint8 (±0.5/255
    quantization vs the reference's float remap — far below the bf16 conv
    noise downstream).  Exists because frame bytes, not FLOPs, bound the
    extraction pipeline; set ``host_cube_remap: false`` for the all-device
    exact path.
    """
    import cv2

    h, w = frame_u8.shape[:2]
    in_x, in_y = _equi2cube_maps_f32(cube_dim, h, w)
    faces = np.empty((6, cube_dim, cube_dim, 3), np.uint8)
    for f in range(6):
        faces[f] = cv2.remap(frame_u8, in_x[f], in_y[f], cv2.INTER_LINEAR)
    return faces


@lru_cache(maxsize=8)
def _equi2cube_maps_f32(cube_dim: int, h: int, w: int):
    """cv2.remap wants f32 maps; converting the cached f64 maps per call
    cost ~1-2 host-ms per frame on the serving path — cache the f32 form."""
    from cp360_tpu.geometry import build_equi2cube_maps

    in_x, in_y = build_equi2cube_maps(cube_dim, h, w)
    return (np.ascontiguousarray(in_x.astype(np.float32)),
            np.ascontiguousarray(in_y.astype(np.float32)))


# --- 4:2:0 chroma-subsampled upload (halves H2D bytes) ---------------------
#
# The transfer tunnel, not FLOPs, bounds stage 1 (~0.9 MB/frame of u8 faces
# at ~40 MB/s).  BT.601 full-range YUV with 2x2-subsampled chroma carries the
# same faces in ~0.45 MB: Y [6,cd,cd] u8 + UV [6,cd/2,cd/2,2] u8.  The
# device reconstructs RGB (bilinear chroma upsample); reconstruction error
# is u8-rounding + chroma-edge loss, bounded by tests/test_extract.py and
# BENCH_UPLOAD=rgb8 vs yuv420 runs of bench.py against the exact-RGB path.

_YUV_M = np.array(
    [[0.299, 0.587, 0.114],        # Y
     [-0.168736, -0.331264, 0.5],  # U (Cb)
     [0.5, -0.418688, -0.081312]], # V (Cr)
    np.float32,
)


def host_rgb_to_yuv420(faces_u8: np.ndarray):
    """[..., h, w, 3] u8 RGB -> (Y [..., h, w] u8, UV [..., h/2, w/2, 2] u8).

    Full-range BT.601; chroma is 2x2 box-averaged before quantization."""
    f = faces_u8.astype(np.float32)
    y = f @ _YUV_M[0]
    u = f @ _YUV_M[1] + 128.0
    v = f @ _YUV_M[2] + 128.0
    uv = np.stack([u, v], axis=-1)
    sh = uv.shape
    h, w = sh[-3], sh[-2]
    uv = uv.reshape(*sh[:-3], h // 2, 2, w // 2, 2, 2).mean(axis=(-4, -2))
    return (np.clip(y + 0.5, 0, 255).astype(np.uint8),
            np.clip(uv + 0.5, 0, 255).astype(np.uint8))


def host_faces_for_upload(frame_u8: np.ndarray, cube_dim: int, yuv: bool):
    """Cube-sample a frame on host and package it for upload.

    The one shared definition of the remap(+optional 4:2:0) preprocessing —
    extract, streaming, and the benches all feed the device through this,
    so a change to the upload format cannot silently diverge them.
    """
    faces = host_equi_to_cube_u8(frame_u8, cube_dim)
    return host_rgb_to_yuv420(faces) if yuv else faces


# Chroma-upsample execution form (measured on-chip r5, tools/bench_yuv_up.py):
# 'slice' rebuilds the static 2x bilinear taps from shifted slices + a
# stack/reshape interleave; 'take' is the original jnp.take gather form.
# jnp.take of short rows is this libtpu's known gather pathology (CLAUDE.md)
# — the halo strips measured ~1 ms for the same pattern at far smaller sizes.
_YUV_UP_FORM = os.environ.get("CP360_YUV_UP", "")
if _YUV_UP_FORM not in ("", "take", "slice"):
    raise ValueError(
        f"CP360_YUV_UP={_YUV_UP_FORM!r} is not one of '', 'take', 'slice'")


def _up2_axis_take(x: jax.Array, axis: int, n_out: int) -> jax.Array:
    """2x bilinear upsample along ``axis`` via a gather (reference form)."""
    pos = (jnp.arange(n_out, dtype=jnp.float32) - 0.5) / 2.0
    i0 = jnp.clip(jnp.floor(pos), 0, x.shape[axis] - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, x.shape[axis] - 1)
    frac = jnp.clip(pos - i0, 0.0, 1.0)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = n_out
    frac = frac.reshape(shape)
    return a * (1 - frac) + b * frac


def _up2_axis_slice(x: jax.Array, axis: int, n_out: int) -> jax.Array:
    """2x bilinear upsample along ``axis`` from shifted slices (no gather).

    The tap pattern is static: out[2j] = 0.25*in[j-1] + 0.75*in[j] (j>=1,
    out[0]=in[0]), out[2j+1] = 0.75*in[j] + 0.25*in[j+1] (j<n-1,
    out[2n-1]=in[n-1]) — identical coefficients (and operand order, so
    bit-identical results) to the gather form's clipped (k-0.5)/2 sampling.
    """
    n = x.shape[axis]
    assert n_out == 2 * n

    def sl(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return x[tuple(idx)]

    lo, hi = sl(0, n - 1), sl(1, n)
    even = jnp.concatenate([sl(0, 1), 0.25 * lo + 0.75 * hi], axis=axis)
    odd = jnp.concatenate([0.75 * lo + 0.25 * hi, sl(n - 1, n)], axis=axis)
    inter = jnp.stack([even, odd], axis=axis + 1)
    return inter.reshape(*x.shape[:axis], n_out, *x.shape[axis + 1:])


def _device_yuv420_to_rgb01(y_u8: jax.Array, uv_u8: jax.Array) -> jax.Array:
    """Inverse of :func:`host_rgb_to_yuv420` on device -> float RGB in [0,1].

    Chroma upsamples bilinearly (align_corners-style on the 2x2 box grid:
    each output pixel interpolates the box centers, edge-clamped)."""
    y = y_u8.astype(jnp.float32)
    uv = uv_u8.astype(jnp.float32) - 128.0
    *lead, h2, w2, _ = uv.shape
    uv_flat = uv.reshape(-1, h2, w2, 2)
    up_axis = (_up2_axis_slice if (_YUV_UP_FORM or "slice") == "slice"
               else _up2_axis_take)
    up = up_axis(up_axis(uv_flat, 1, h2 * 2), 2, w2 * 2)
    up = up.reshape(*lead, h2 * 2, w2 * 2, 2)
    u, v = up[..., 0], up[..., 1]
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0.0, 255.0) / 255.0


@partial(jax.jit, static_argnames=("arch", "use_cube_pad", "compute_dtype", "out_dtype", "codec"))
def stage1_batch_faces_yuv(
    params: dict,
    y_u8: jax.Array,
    uv_u8: jax.Array,
    arch: str = "resnet50",
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.float16,
    codec: str = "none",
):
    """:func:`stage1_batch_faces` fed by 4:2:0 planes (half the H2D bytes).

    Args:
      y_u8: [N, 6, cd, cd] uint8 luma.
      uv_u8: [N, 6, cd/2, cd/2, 2] uint8 chroma (Cb, Cr offset by 128).

    ``codec="int8"`` additionally halves the D2H side (see
    :func:`stage1_batch_faces`).
    """
    cubes = _device_yuv420_to_rgb01(y_u8, uv_u8)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    cubes = (cubes - mean) / std
    scores, _ = _backbone_cam(params, cubes, arch, use_cube_pad, compute_dtype)
    equi_scores = cube_to_equi(scores)
    sal = jnp.max(equi_scores, axis=-1) ** 2
    if codec == "int8":
        from cp360_tpu.ops.quantize import quantize_cam

        # f16 scales: transfer-only stream (host dequantizes right after
        # D2H), halves the scale bytes (~3% of the frame's D2H budget —
        # PARITY link-budget table) at <=2^-11 step-size change
        q, scales = quantize_cam(scores, scale_dtype=jnp.float16)
        return q, scales, sal
    return scores.astype(out_dtype), sal


@partial(jax.jit, static_argnames=("cube_dim", "arch", "use_cube_pad",
                                   "compute_dtype", "out_dtype"))
def stage1_batch(
    params: dict,
    frames_u8: jax.Array,
    cube_dim: int = 224,
    arch: str = "resnet50",
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.float32,
):
    """Fused device step for a BATCH of frames: uint8 equi -> (CAM, saliency).

    Args:
      frames_u8: [N, H, 2H, 3] uint8 RGB frames (the decoded+resized image
        exactly as PIL produces it; /255 happens on device, bit-equal to the
        reference's host normalization, dataset_feat_extractor.py:131,142).

    Returns:
      scores: [N, 6, h, w, 1000] CAM score cubes (``out_dtype``, NHWC —
              honors cfg.feat_dtype like the host-remap paths).
      sal:    [N, 2h, 4w] equi saliency (channel max of projected scores,
              squared — dataset_feat_extractor.py:173-176).

    uint8 transfer + on-device normalization cuts host->device bytes 4x —
    the PCIe/tunnel transfer, not FLOPs, bounds this pipeline.
    """
    equi01 = frames_u8.astype(jnp.float32) / 255.0
    cubes = equi_to_cube(equi01, cube_dim)  # [N, 6, cd, cd, 3]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    cubes = (cubes - mean) / std
    scores, _ = _backbone_cam(params, cubes, arch, use_cube_pad, compute_dtype)
    equi_scores = cube_to_equi(scores)  # [N, 2h, 4w, 1000]
    sal = jnp.max(equi_scores, axis=-1) ** 2
    return scores.astype(out_dtype), sal


def stage1_step(
    params: dict,
    equi01: jax.Array,
    cube_dim: int = 224,
    arch: str = "resnet50",
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
):
    """Single-frame convenience wrapper over :func:`stage1_batch`.

    Args:
      equi01: [H, 2H, 3] float RGB in [0,1] (or uint8).
    """
    if equi01.dtype != jnp.uint8:
        frames = (jnp.clip(equi01, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    else:
        frames = equi01
    scores, sal = stage1_batch(
        params, frames[None], cube_dim=cube_dim, arch=arch,
        use_cube_pad=use_cube_pad, compute_dtype=compute_dtype,
    )
    return scores[0], sal[0]


def _artifacts_exist(cnt, feat_dir, motion_dir, img_dir, out_dir,
                     need_feat, need_motion, need_img) -> bool:
    if need_feat and not os.path.exists(os.path.join(feat_dir, f"{cnt:06}.npy")):
        return False
    if need_motion and not os.path.exists(os.path.join(motion_dir, f"{cnt:06}.npy")):
        return False
    if need_img and not (
        os.path.exists(os.path.join(img_dir, f"{cnt:06}.jpg"))
        and os.path.exists(os.path.join(out_dir, f"{cnt:06}.jpg"))
    ):
        return False
    return need_feat or need_motion or need_img


def _atomic_pil_save(img, path: str) -> None:
    """PIL save that lands atomically (same contract as utils/atomic.py:
    the tmp name carries NO image extension so listers never see it —
    the format is passed explicitly instead of inferred)."""
    tmp = path + ".tmp"
    fmt = {"jpg": "JPEG", "jpeg": "JPEG", "png": "PNG"}[
        path.rsplit(".", 1)[1].lower()]
    img.save(tmp, format=fmt)
    os.replace(tmp, path)


def _resize_frame_pil(frame_bgr: np.ndarray, wh):
    """BGR frame -> (uint8 array at (w, h), PIL image), LANCZOS.

    The reference wraps the raw cv2 (BGR) frame in PIL without channel
    conversion (dataset_feat_extractor.py:127-131) — so the CNN actually
    sees B and R swapped.  Reproduced for artifact/metric parity.  The
    uint8 array /255 on device equals the reference's host /255 bit-for-bit.
    """
    from PIL import Image

    img = Image.fromarray(frame_bgr).convert("RGB")
    img = img.resize(wh, resample=getattr(Image, "LANCZOS", Image.Resampling.LANCZOS))
    return np.asarray(img, dtype=np.uint8), img


def extract_video(
    params: dict,
    cfg: Config,
    vid_path: str,
    out_dir: str,
    output_img: bool = True,
    output_feature: bool = True,
    output_motion: bool = True,
    arch: str = "resnet50",
    max_frames: Optional[int] = None,
    batch_frames: int = 8,
    resume: bool = True,
    log_fn=print,
    mesh=None,
) -> int:
    """Process one video; returns the number of frames written.

    Frames are processed in device batches of ``batch_frames`` with a
    one-deep pipeline: batch k's artifacts are written to disk while batch
    k+1 computes on device (JAX dispatch is async).

    ``resume=True`` makes extraction restartable (SURVEY.md §5.3): frames
    whose requested artifacts already exist on disk are skipped, so a
    killed/crashed job continues where it stopped.

    With a ``mesh``, the frame batch shards along its data axis (frames are
    independent — the reference's loop is serial only by construction,
    dataset_feat_extractor.py:119-123) and params replicate; each chip runs
    batch_frames / n_data frames of the identical fused graph.
    """
    from concurrent.futures import ThreadPoolExecutor

    import cv2

    from cp360_tpu.flow.optical_flow import get_flow_fn

    if cfg.transfer_codec not in ("none", "int8"):
        # 'auto' must be resolved against a link measurement BEFORE the
        # pipeline runs (cli/extract_features.py does this at startup via
        # utils/linkprobe.resolve_codec) — an unresolved value silently
        # behaving as 'none' is the fallthrough class ADVICE r4 flagged
        raise ValueError(
            f"transfer_codec={cfg.transfer_codec!r} is not one of "
            f"'none', 'int8' (resolve 'auto' via "
            f"linkprobe.resolve_codec first)")

    # open the video BEFORE creating worker pools so an unreadable path
    # cannot leak executors
    cap = cv2.VideoCapture(vid_path)
    if not cap.isOpened():
        raise FileNotFoundError(
            f"cannot open video {vid_path!r} (missing file or unsupported codec)"
        )

    flow_fn = get_flow_fn(cfg.flow_backend)
    # flow is the slowest host stage (SURVEY.md §3.1 hot spot #3); cv2
    # releases the GIL, so frame pairs run across a worker pool.  DEVICE
    # flow backends must NOT run on the pool: their H2D/D2H would race the
    # main thread's batch transfers, and client-thread-concurrent
    # transfers intermittently wedge this relay (see assemble()) — instead
    # (round 4) the whole extraction batch of pairs solves in ONE vmapped
    # dispatch on the main thread (flow/optical_flow.py batch solvers),
    # with only the host resize/grayscale preprocessing on a pool, and the
    # solved flow crossing D2H asynchronously in cfg.flow_link_dtype.
    device_flow = cfg.flow_backend in ("horn_schunck", "variational")
    flow_pool = (ThreadPoolExecutor(max_workers=cfg.processes)
                 if cfg.opt_flow and output_motion and not device_flow else None)
    flow_inline = cfg.opt_flow and output_motion and device_flow
    flow_prep_pool = (ThreadPoolExecutor(max_workers=max(2, cfg.processes))
                      if flow_inline else None)
    if flow_inline:
        from cp360_tpu.flow.optical_flow import (
            _preprocess_pair,
            get_batch_solver_u8,
        )

        flow_solver = get_batch_solver_u8(cfg.flow_backend, cfg.flow_link_dtype)
    # cube remap is the next-slowest host stage (~12 ms/frame): submit it
    # per-frame at decode time so it overlaps decode + the previous batch's
    # transfer/compute instead of serializing inside submit()
    remap_pool = ThreadPoolExecutor(max_workers=max(2, cfg.processes)) if cfg.host_cube_remap else None

    feat_dir = os.path.join(out_dir, "cube_feat")
    motion_dir = os.path.join(out_dir, "motion")
    img_dir = os.path.join(out_dir, "img")
    for d in (out_dir, feat_dir, motion_dir, img_dir):
        os.makedirs(d, exist_ok=True)

    try:
        # setup after the capture/pools exists can still fail (mesh
        # validation, a wedged device_put) — release them on the way out,
        # the main loop's try/finally doesn't cover this stretch
        if mesh is not None:
            from cp360_tpu.parallel.mesh import data_sharding, replicated

            n_data = mesh.shape.get("data", 1)
            if batch_frames % n_data:
                raise ValueError(
                    f"batch_frames={batch_frames} must be divisible by the mesh "
                    f"data axis ({n_data} devices) so frames shard evenly"
                )
            params = jax.device_put(params, replicated(mesh))
            _shard_in = lambda x: jax.device_put(x, data_sharding(mesh))  # noqa: E731
        else:
            _shard_in = jnp.asarray

        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if max_frames is not None:
            total = min(total, max_frames)
    except BaseException:
        cap.release()
        if flow_pool is not None:
            flow_pool.shutdown(wait=False)
        if flow_prep_pool is not None:
            flow_prep_pool.shutdown(wait=False)
        if remap_pool is not None:
            remap_pool.shutdown(wait=False)
        raise

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    wh = (cfg.equi_h, cfg.equi_w)  # PIL (width, height) — see Config docs

    from collections import deque

    t_start = time.time()
    written = 0
    # outstanding device outputs, oldest first: (counts, device output
    # arrays, pil images, flows).  cfg.fetch_depth entries ride here before
    # the oldest is fetched — the D2H mirror of the upload_depth queue
    pendings: deque = deque()
    fetch_depth = max(1, cfg.fetch_depth)

    def flush(pending):
        nonlocal written
        cnts, dev_out, pil_imgs, flows = pending
        if isinstance(flows, tuple) and flows and flows[0] == "batched_flow":
            _, dev_flow, n_valid = flows
            flow_np = fetch_np(dev_flow)
            # (absflow, flow) per frame like the per-pair wrappers; only
            # flow ([..., 2]) feeds the motion artifact below
            flows = [(None, flow_np[k]) for k in range(n_valid)]
        if len(dev_out) == 3:  # transfer_codec=int8: (q, scales, sal) crossed D2H
            from cp360_tpu.ops.quantize import dequantize_cam_np

            q, scales, sals = fetch_np(*dev_out)
            scores = dequantize_cam_np(
                q, scales, np.float16 if cfg.feat_dtype == "float16" else np.float32
            )
        else:
            scores, sals = fetch_np(*dev_out)  # [B, 6, 7, 7, 1000] NHWC
        # atomic writes: resume treats an existing artifact as complete, so
        # a supervisor SIGKILL mid-write must never leave a truncated file
        # under a final name (utils/atomic.py)
        for k, cnt in enumerate(cnts):
            if output_feature:
                atomic_save(
                    os.path.join(feat_dir, f"{cnt:06}.npy"),
                    scores[k].transpose(0, 3, 1, 2),  # reference [6,1000,7,7]
                )
            if output_motion and flows[k] is not None:
                flow_k = flows[k].result() if hasattr(flows[k], "result") else flows[k]
                atomic_save(
                    os.path.join(motion_dir, f"{cnt:06}.npy"),
                    flow_k[1].astype(np.float32),
                )
            if output_img:
                _atomic_pil_save(overlay(pil_imgs[k], sals[k]),
                                 os.path.join(out_dir, f"{cnt:06}.jpg"))
                _atomic_pil_save(pil_imgs[k],
                                 os.path.join(img_dir, f"{cnt:06}.jpg"))
            written += 1

    out_dtype = jnp.float16 if cfg.feat_dtype == "float16" else jnp.float32
    yuv = cfg.host_cube_remap and cfg.upload_format == "yuv420"

    def assemble(batch):
        """Wait the batch's remap futures + stack (runs on the dedicated
        assembly thread so the decode loop never blocks on host remap).
        Returns HOST arrays: the device_put stays on the main thread —
        client-thread-concurrent transfers intermittently wedge this
        relay (bench.py measured it), and device_put here is deferred
        anyway (bytes cross when the consuming compute runs)."""
        if cfg.host_cube_remap:
            done = [b[4].result() for b in batch]  # remapped at decode time
            if yuv:
                ys = np.stack([d[0] for d in done]
                              + [done[-1][0]] * (batch_frames - len(batch)))
                uvs = np.stack([d[1] for d in done]
                               + [done[-1][1]] * (batch_frames - len(batch)))
                return ys, uvs
            faces = np.stack(done + [done[-1]] * (batch_frames - len(batch)))
            return (faces,)
        frames_u8 = np.stack([b[1] for b in batch])
        if len(batch) < batch_frames:  # pad the tail, keep shapes static
            reps = np.repeat(frames_u8[-1:], batch_frames - len(batch), axis=0)
            frames_u8 = np.concatenate([frames_u8, reps], axis=0)
        return (frames_u8,)

    def compute(batch, dev_arrays):
        cnts = [b[0] for b in batch]
        if cfg.host_cube_remap:
            fn = stage1_batch_faces_yuv if yuv else stage1_batch_faces
            dev_out = fn(
                params, *dev_arrays, arch=arch,
                use_cube_pad=cfg.cube_pad, compute_dtype=compute_dtype,
                out_dtype=out_dtype, codec=cfg.transfer_codec,
            )
        else:
            dev_out = stage1_batch(
                params, *dev_arrays, cube_dim=cfg.cube_dim,
                arch=arch, use_cube_pad=cfg.cube_pad, compute_dtype=compute_dtype,
                out_dtype=out_dtype,  # feat_dtype applies on this path too
            )
        # D2H starts NOW, overlapping the next batches' H2D/compute (the
        # synchronous fetch path is ~20x slower on this tunnel)
        async_start(*dev_out)
        flows = [b[3] for b in batch]
        if flow_inline:
            # one vmapped solve for the whole batch of pairs: uint8 grays
            # up, flow down in cfg.flow_link_dtype, fetched async with the
            # CAM outputs (the per-pair dispatch was ~0.1 s/pair — the old
            # extraction wall for device flow)
            pairs = [f.result() for f in flows]
            n_valid = len(pairs)
            pairs = pairs + [pairs[-1]] * (batch_frames - n_valid)
            dev_flow = flow_solver(np.stack([p[0] for p in pairs]),
                                   np.stack([p[1] for p in pairs]))
            async_start(dev_flow)
            flows = ("batched_flow", dev_flow, n_valid)
        return (cnts, dev_out, [b[2] for b in batch], flows)

    upload_pool = ThreadPoolExecutor(max_workers=1)  # host assembly only
    upload_depth = max(1, cfg.upload_depth)
    uploads: deque = deque()  # (batch, future of host arrays)

    def remap_job(frame_u8):
        return host_faces_for_upload(frame_u8, cfg.cube_dim, yuv)

    def drain_one():
        b, fut = uploads.popleft()
        dev_arrays = tuple(_shard_in(a) for a in fut.result())
        pendings.append(compute(b, dev_arrays))
        while len(pendings) > fetch_depth:
            flush(pendings.popleft())

    batch = []
    prev_bgr = None
    ok_done = False
    try:
        for i in range(total):
            ok, frame = cap.read()
            if not ok:
                break
            if i == 0:
                prev_bgr = frame
                continue

            cnt = i + 1  # reference numbering starts at 000002
            if resume and _artifacts_exist(
                cnt, feat_dir, motion_dir, img_dir, out_dir,
                output_feature, output_motion and cfg.opt_flow, output_img,
            ):
                written += 1
                prev_bgr = frame
                continue
            frame_u8, pil_img = _resize_frame_pil(prev_bgr, wh)
            flow = None
            if flow_pool is not None:
                flow = flow_pool.submit(
                    flow_fn, prev_bgr, frame, res=(cfg.flow_h * 2, cfg.flow_h)
                )
            elif flow_inline:
                # device backend: only the host resize/grayscale runs on a
                # pool; the whole batch of pairs solves in ONE vmapped
                # dispatch in compute() (main-thread transfers only)
                flow = flow_prep_pool.submit(
                    _preprocess_pair, prev_bgr, frame,
                    (cfg.flow_h * 2, cfg.flow_h))
            faces_fut = (remap_pool.submit(remap_job, frame_u8)
                         if remap_pool is not None else None)
            batch.append((cnt, frame_u8, pil_img, flow, faces_fut))
            prev_bgr = frame

            if len(batch) == batch_frames:
                uploads.append((batch, upload_pool.submit(assemble, batch)))
                batch = []
                if len(uploads) > upload_depth:
                    drain_one()

        if batch:
            uploads.append((batch, upload_pool.submit(assemble, batch)))
        while uploads:
            drain_one()
        while pendings:
            flush(pendings.popleft())
        ok_done = True
    finally:
        # in finally so a mid-extract exception (decode, remap, flow, disk)
        # cannot leak the capture handle or the worker pools; on the error
        # path don't wait on possibly-wedged futures
        cap.release()
        upload_pool.shutdown(wait=ok_done)
        if flow_pool is not None:
            flow_pool.shutdown(wait=ok_done)
        if flow_prep_pool is not None:
            flow_prep_pool.shutdown(wait=ok_done)
        if remap_pool is not None:
            remap_pool.shutdown(wait=ok_done)
    log_fn(f"{vid_path}: {written} frames in {time.time() - t_start:.1f}s")
    return written
