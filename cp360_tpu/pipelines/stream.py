"""Streaming end-to-end pipeline: video frames -> temporal saliency, no disk.

The reference is strictly two offline stages coupled through .npy artifacts
(SURVEY.md §1.2).  For deployment, this pipeline fuses them: decoded frames
stream through the stage-1 CAM step in device batches, the CAM cubes stay in
a short host ring (f16), and every time ``seq_len`` consecutive frames are
available the stage-2 window protocol (joint min/max normalization, state
seeded with the first frame — exactly the published eval protocol) produces
a saliency map.  Artifact writing is optional, not structural.

Yields (frame_id, saliency [2h, 4w]) with frame ids matching the offline
pipeline's saved/GT numbering.  One deliberate delta: the reference's loop
bound skips the final complete window (``idx >= len(seq) - num_subseq``
continues one window early, test_temporal.py:61-62); streaming emits it —
the offline outputs are a strict prefix.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cp360_tpu.config import Config
from cp360_tpu.pipelines.extract import host_equi_to_cube_u8, stage1_batch_faces
from cp360_tpu.pipelines.temporal import window_infer


def stream_video_saliency(
    backbone_params: dict,
    clstm_params: dict,
    vid_path: str,
    cfg: Config,
    arch: str = "resnet50",
    stage1_batch: int = 8,
    window_batch: int = 8,
    max_frames: Optional[int] = None,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Stream temporal saliency maps for a video.

    Equivalent to extract_features -> test_temporal on the same video, with
    the CAM cubes never touching disk.
    """
    import cv2
    from PIL import Image

    seq_len = cfg.seq_len
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    wh = (cfg.equi_h, cfg.equi_w)

    cap = cv2.VideoCapture(vid_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if max_frames is not None:
        total = min(total, max_frames)

    cam_ring: deque = deque(maxlen=None)  # (counter, cam [6,h,w,C] f16)
    pending_windows = []  # list of (end_counter, window [T,6,h,w,C])

    def flush_windows(force: bool = False):
        while pending_windows and (force or len(pending_windows) >= window_batch):
            chunk = pending_windows[:window_batch]
            del pending_windows[: len(chunk)]
            batch = np.stack([w for _, w in chunk])
            if batch.shape[0] < window_batch:  # pad tail: one compiled shape
                reps = np.repeat(batch[-1:], window_batch - batch.shape[0], axis=0)
                batch = np.concatenate([batch, reps], axis=0)
            preds = np.asarray(
                window_infer(
                    clstm_params, jnp.asarray(batch),
                    use_cube_pad=cfg.cube_pad, compute_dtype=compute_dtype,
                )
            )
            for (end_cnt, _), p in zip(chunk, preds):
                # id matches the offline pipeline's saved/GT numbering
                # ({position + seq_len - 1:05}, test_temporal.py:86-88):
                # artifact counters start at 2, so subtract 2.
                yield end_cnt - 2, p

    def process_frame_batch(batch):  # [(cnt, frame_u8)]
        faces = np.stack([host_equi_to_cube_u8(f, cfg.cube_dim) for _, f in batch])
        scores, _ = stage1_batch_faces(
            backbone_params, jnp.asarray(faces), arch=arch,
            use_cube_pad=cfg.cube_pad, compute_dtype=compute_dtype,
            out_dtype=jnp.float16,
        )
        scores = np.asarray(scores)
        for (cnt, _), cam in zip(batch, scores):
            cam_ring.append((cnt, cam))
        # form complete windows (stride 1, protocol ordering)
        while len(cam_ring) >= seq_len:
            window = np.stack([cam_ring[i][1] for i in range(seq_len)])
            end_cnt = cam_ring[seq_len - 1][0]
            pending_windows.append((end_cnt, window))
            cam_ring.popleft()

    prev = None
    fbatch = []
    for i in range(total):
        ok, frame = cap.read()
        if not ok:
            break
        if i == 0:
            prev = frame
            continue
        cnt = i + 1  # reference numbering
        img = Image.fromarray(prev).convert("RGB").resize(
            wh, resample=getattr(Image, "LANCZOS", Image.Resampling.LANCZOS)
        )
        fbatch.append((cnt, np.asarray(img, np.uint8)))
        prev = frame
        if len(fbatch) == stage1_batch:
            process_frame_batch(fbatch)
            fbatch = []
            yield from flush_windows()
    if fbatch:
        process_frame_batch(fbatch)
    yield from flush_windows(force=True)
    cap.release()
