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

from typing import Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cp360_tpu.config import Config
from cp360_tpu.pipelines.extract import (
    _resize_frame_pil,
    host_faces_for_upload,
    stage1_batch_faces,
    stage1_batch_faces_yuv,
)
from cp360_tpu.pipelines.temporal import (
    window_infer_from_frames,
    window_infer_from_frames_pipelined,
)


def stream_video_saliency(
    backbone_params: dict,
    clstm_params: dict,
    vid_path: str,
    cfg: Config,
    arch: str = "resnet50",
    stage1_batch: int = 8,
    max_frames: Optional[int] = None,
    start_output: int = 0,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Stream temporal saliency maps for a video.

    Equivalent to extract_features -> test_temporal on the same video, with
    the CAM cubes never touching disk — or the host: stage-1 scores stay on
    device, a device-side carry of the last seq_len-1 CAM frames bridges
    batches, and only the tiny [2h, 4w] saliency maps come back.

    ``start_output`` resumes mid-video: maps with id < start_output are not
    produced, and every frame the remaining windows don't touch skips both
    the cube remap and the device step (decode fast-skips via cap.grab).
    Per-window normalization + state seeding make windows independent
    (test_temporal.py:66-79), so the resumed suffix is identical to the
    same ids from a start_output=0 run — this is what makes a supervised
    restart of a long streaming job nearly free.
    """
    import cv2

    seq_len = cfg.seq_len
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    wh = (cfg.equi_h, cfg.equi_w)

    # validate EAGERLY (this is the non-generator part of the function, so a
    # bad path raises at call time, not at the first next())
    cap = cv2.VideoCapture(vid_path)
    if not cap.isOpened():
        raise FileNotFoundError(
            f"cannot open video {vid_path!r} (missing file or unsupported codec)"
        )
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if max_frames is not None:
        total = min(total, max_frames)

    # pipeline parallelism (config key pipeline_stages): the per-window
    # recurrence pipelines its seq_len time steps over a 1-D device mesh,
    # window batches flowing through as microbatches (parallel/pipeline.py)
    pipe_mesh = None
    if cfg.pipeline_stages > 1:
        if seq_len % cfg.pipeline_stages:
            cap.release()
            raise ValueError(
                f"pipeline_stages={cfg.pipeline_stages} must divide "
                f"seq_len={seq_len} (each stage runs seq_len/stages steps)"
            )
        from cp360_tpu.parallel.pipeline import make_pipe_mesh

        pipe_mesh = make_pipe_mesh(cfg.pipeline_stages)

    return _stream_frames(backbone_params, clstm_params, cfg, arch,
                          stage1_batch, cap, total, seq_len, compute_dtype, wh,
                          pipe_mesh, start_output=start_output)


def _remap_job(frame_u8, cube_dim, yuv):
    return host_faces_for_upload(frame_u8, cube_dim, yuv)


def _stream_frames(backbone_params, clstm_params, cfg, arch, stage1_batch,
                   cap, total, seq_len, compute_dtype, wh, pipe_mesh=None,
                   start_output=0):

    carry = None  # device [seq_len-1, 6, h, w, C] — trailing CAM frames
    carry_cnts: list = []

    yuv = cfg.upload_format == "yuv420"

    def process_frame_batch(batch):  # [(cnt, faces_future)] -> yields (id, sal)
        nonlocal carry, carry_cnts
        done = [f.result() for _, f in batch]
        # pad the tail batch to stage1_batch (repeating the last frame, like
        # extract.py's assemble): a smaller final batch would retrace BOTH
        # jitted graphs for a handful of frames — compiles cost 0.5-4 min
        # on this toolchain.  Padded frames never reach a yielded window.
        pad = stage1_batch - len(done)
        if pad > 0:
            done = done + [done[-1]] * pad
        if yuv:  # half the H2D bytes (see pipelines/extract.py)
            scores, _ = stage1_batch_faces_yuv(
                backbone_params,
                jnp.asarray(np.stack([d[0] for d in done])),
                jnp.asarray(np.stack([d[1] for d in done])),
                arch=arch, use_cube_pad=cfg.cube_pad,
                compute_dtype=compute_dtype, out_dtype=jnp.float16,
            )
        else:
            scores, _ = stage1_batch_faces(
                backbone_params, jnp.asarray(np.stack(done)), arch=arch,
                use_cube_pad=cfg.cube_pad, compute_dtype=compute_dtype,
                out_dtype=jnp.float16,
            )  # device [B, 6, h, w, C]
        cnts = [c for c, _ in batch] + [batch[-1][0]] * max(0, pad)
        if carry is None:
            frames_dev = scores
            all_cnts = cnts
        else:
            frames_dev = jnp.concatenate([carry, scores], axis=0)
            all_cnts = carry_cnts + cnts

        n = frames_dev.shape[0]
        n_real = n - max(0, pad)  # frames that exist in the video
        n_windows = n - seq_len + 1  # static across batches (incl. the tail)
        real_windows = n_real - seq_len + 1
        if real_windows > 0:
            positions = jnp.arange(n_windows, dtype=jnp.int32)
            from cp360_tpu.utils.transfer import fetch_np

            if pipe_mesh is not None:
                import math

                n_micro = max(1, math.gcd(n_windows, cfg.pipeline_microbatches))
                preds = fetch_np(
                    window_infer_from_frames_pipelined(
                        clstm_params, frames_dev, positions, pipe_mesh,
                        n_micro, seq_len=seq_len, use_cube_pad=cfg.cube_pad,
                        compute_dtype=compute_dtype,
                        conv_impl=cfg.clstm_conv_impl,
                    )
                )
            else:
                preds = fetch_np(
                    window_infer_from_frames(
                        clstm_params, frames_dev, positions, seq_len=seq_len,
                        use_cube_pad=cfg.cube_pad, compute_dtype=compute_dtype,
                        conv_impl=cfg.clstm_conv_impl,
                    )
                )
            for k in range(real_windows):
                # id matches the offline saved/GT numbering
                # ({position + seq_len - 1:05}, test_temporal.py:86-88):
                # artifact counters start at 2, so subtract 2.  Windows
                # past real_windows contain pad frames and are dropped.
                yield all_cnts[k + seq_len - 1] - 2, preds[k]

        keep = seq_len - 1
        carry = frames_dev[:n_real][-keep:]  # trailing REAL frames only
        carry_cnts = all_cnts[:n_real][-keep:]

    from concurrent.futures import ThreadPoolExecutor

    # cube remap rides a worker pool from decode time (cv2 releases the
    # GIL), overlapping decode + the previous batch's device work — same
    # scheme as pipelines/extract.py
    remap_pool = ThreadPoolExecutor(max_workers=4)
    # resume: map id m is yielded from the window whose LAST frame counter
    # is m+2 (ids = cnt-2 below), so its first frame counter is m+3-seq_len
    # — every earlier frame feeds only already-produced windows.  prev must
    # hold the video frame processed at that counter (frame index cnt-2,
    # the 2-frame-lag numbering quirk), so grab() through index skip_to-1.
    min_cnt = start_output + 3 - seq_len
    skip_to = max(0, min_cnt - 2)
    try:
        prev = None
        fbatch = []
        for i in range(total):
            if i < skip_to:
                if not cap.grab():  # decode-skip: no retrieve, no remap
                    break
                continue
            ok, frame = cap.read()
            if not ok:
                break
            if i == skip_to:
                prev = frame
                continue
            cnt = i + 1  # reference numbering
            frame_u8, _ = _resize_frame_pil(prev, wh)
            fut = remap_pool.submit(_remap_job, frame_u8, cfg.cube_dim, yuv)
            fbatch.append((cnt, fut))
            prev = frame
            if len(fbatch) == stage1_batch:
                yield from process_frame_batch(fbatch)
                fbatch = []
        if fbatch:
            yield from process_frame_batch(fbatch)
    finally:
        # in finally so an abandoned generator / mid-stream exception cannot
        # leak the cv2 capture handle
        cap.release()
        remap_pool.shutdown(wait=True)
