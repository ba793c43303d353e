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
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.config import Config
from cp360_tpu.imaging.overlay import IMAGENET_MEAN, IMAGENET_STD, overlay
from cp360_tpu.models.cam import cam_forward
from cp360_tpu.ops.resample import cube_to_equi, equi_to_cube


@partial(jax.jit, static_argnames=("cube_dim", "arch", "use_cube_pad", "compute_dtype"))
def stage1_step(
    params: dict,
    equi01: jax.Array,
    cube_dim: int = 224,
    arch: str = "resnet50",
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
):
    """One fused device step: equi frame in [0,1] -> (CAM cube, saliency).

    Args:
      equi01: [H, 2H, 3] RGB frame scaled to [0, 1].

    Returns:
      scores: [6, h, w, 1000] CAM score cube (f32, NHWC).
      sal:    [2h, 4w] equi saliency (channel max of projected scores,
              squared — dataset_feat_extractor.py:173-176).
    """
    cubes = equi_to_cube(equi01, cube_dim)  # [6, cd, cd, 3]
    mean = jnp.asarray(IMAGENET_MEAN, equi01.dtype)
    std = jnp.asarray(IMAGENET_STD, equi01.dtype)
    cubes = (cubes - mean) / std
    scores, _ = cam_forward(
        params, cubes[None], arch=arch, use_cube_pad=use_cube_pad,
        compute_dtype=compute_dtype,
    )
    equi_scores = cube_to_equi(scores[0])  # [2h, 4w, 1000]
    sal = jnp.max(equi_scores, axis=-1) ** 2
    return scores[0], sal


def _resize_frame_pil(frame_bgr: np.ndarray, wh) -> np.ndarray:
    """BGR frame -> RGB-ish [0,1] float at (w, h), LANCZOS.

    The reference wraps the raw cv2 (BGR) frame in PIL without channel
    conversion (dataset_feat_extractor.py:127-131) — so the CNN actually
    sees B and R swapped.  Reproduced for artifact/metric parity.
    """
    from PIL import Image

    img = Image.fromarray(frame_bgr).convert("RGB")
    img = img.resize(wh, resample=getattr(Image, "LANCZOS", Image.Resampling.LANCZOS))
    return np.asarray(img, dtype=np.float32) / 255.0, img


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
    log_fn=print,
) -> int:
    """Process one video; returns the number of frames written."""
    import cv2

    from cp360_tpu.flow.optical_flow import calc_optical_flow

    feat_dir = os.path.join(out_dir, "cube_feat")
    motion_dir = os.path.join(out_dir, "motion")
    img_dir = os.path.join(out_dir, "img")
    for d in (out_dir, feat_dir, motion_dir, img_dir):
        os.makedirs(d, exist_ok=True)

    cap = cv2.VideoCapture(vid_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if max_frames is not None:
        total = min(total, max_frames)

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    wh = (cfg.equi_h, cfg.equi_w)  # PIL (width, height) — see Config docs

    t_start = time.time()
    written = 0
    prev_bgr = None
    pending = None  # (artifact index, device scores, device sal, pil image, flow)

    def flush(pending):
        nonlocal written
        if pending is None:
            return
        cnt, scores_dev, sal_dev, pil_img, flow = pending
        scores = np.asarray(scores_dev)  # [6, 7, 7, 1000] NHWC
        sal = np.asarray(sal_dev)
        if output_feature:
            np.save(
                os.path.join(feat_dir, f"{cnt:06}.npy"),
                scores.transpose(0, 3, 1, 2),  # reference layout [6,1000,7,7]
            )
        if output_motion and flow is not None:
            np.save(os.path.join(motion_dir, f"{cnt:06}.npy"), flow.astype(np.float32))
        if output_img:
            overlay(pil_img, sal).save(os.path.join(out_dir, f"{cnt:06}.jpg"))
            pil_img.save(os.path.join(img_dir, f"{cnt:06}.jpg"))
        written += 1

    for i in range(total):
        ok, frame = cap.read()
        if not ok:
            break
        if i == 0:
            prev_bgr = frame
            continue

        cnt = i + 1  # reference numbering starts at 000002
        equi01, pil_img = _resize_frame_pil(prev_bgr, wh)
        scores_dev, sal_dev = stage1_step(
            params, jnp.asarray(equi01), cube_dim=cfg.cube_dim,
            arch=arch, use_cube_pad=cfg.cube_pad, compute_dtype=compute_dtype,
        )
        flow = None
        if cfg.opt_flow and output_motion:
            _, flow = calc_optical_flow(prev_bgr, frame, res=(cfg.flow_h * 2, cfg.flow_h))

        # One-deep pipeline: write the previous result while the device
        # computes this frame (dispatch above is async).
        flush(pending)
        pending = (cnt, scores_dev, sal_dev, pil_img, flow)
        prev_bgr = frame

    flush(pending)
    cap.release()
    log_fn(f"{vid_path}: {written} frames in {time.time() - t_start:.1f}s")
    return written
