"""Stage-2 temporal inference + evaluation over stage-1 artifacts.

Protocol parity with the reference (temporal_model/test_temporal.py:19-115):
sliding windows of ``seq_len`` CAM cubes at stride 1; each window is jointly
min/max normalized; hidden and cell state are seeded with the window's first
normalized frame; the ConvLSTM rolls over all ``seq_len`` frames; the
prediction is the channel max of the equi-projected final hidden state,
saved as {window_end:05}.npy and scored against the GT fixation map with
AUC-Judd / AUC-Borji / CC / SIM.

TPU-first delta: windows are *batched* — the reference recomputes the
ConvLSTM per window serially (5x recompute at stride 1); here B independent
windows ride the batch axis of one jitted scan (windows are independent by
construction because normalization and state init are per-window).  Results
are identical; wall-clock is ~B/5 x better single chip, and batches shard
over the mesh's data axis for multi-chip.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache, partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.metrics import saliency as M
from cp360_tpu.models.clstm import clstm_rollout
from cp360_tpu.ops.resample import cube_to_equi
from cp360_tpu.parallel.pipeline import pipelined_rollout


def _normalize_windows(windows: jax.Array):
    """Joint per-window min/max normalization -> time-major face-flattened
    sequence [T, B*6, h, w, C] (the published protocol's input form)."""
    windows = windows.astype(jnp.float32)
    b, t = windows.shape[0], windows.shape[1]
    mn = jnp.min(windows, axis=(1, 2, 3, 4, 5), keepdims=True)
    mx = jnp.max(windows, axis=(1, 2, 3, 4, 5), keepdims=True)
    # Deliberate divergence: the reference NaNs on a constant window
    # (test_temporal.py:66-71 divides by max-min == 0); here a constant
    # window normalizes to zeros so saved artifacts stay finite.
    denom = jnp.where(mx > mn, mx - mn, 1.0)
    norm = (windows - mn) / denom
    return jnp.moveaxis(norm, 1, 0).reshape(t, b * 6, *windows.shape[3:]), b


def _project_hidden(h_final: jax.Array, b: int) -> jax.Array:
    """Final hidden cube -> channel-max equi map [B, 2h, 4w]
    (test_temporal.py:82-85)."""
    cubes = h_final.reshape(b, 6, *h_final.shape[1:])
    equi = cube_to_equi(cubes)  # [B, 2h, 4w, C]
    return jnp.max(equi, axis=-1)


@partial(jax.jit, static_argnames=("use_cube_pad", "compute_dtype", "conv_impl"))
def window_infer(
    params: dict,
    windows: jax.Array,
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    conv_impl: str = "xla",
) -> jax.Array:
    """Batched window inference.

    Args:
      windows: [B, T, 6, h, w, C] raw (un-normalized) CAM cubes (any float
        dtype; math runs in f32).

    Returns [B, 2h, 4w] equi saliency predictions (f32).
    """
    x, b = _normalize_windows(windows)
    h0 = c0 = x[0]
    _, h_final, _ = clstm_rollout(
        params, x, h0, c0, use_cube_pad=use_cube_pad, compute_dtype=compute_dtype,
        conv_impl=conv_impl,
    )
    return _project_hidden(h_final, b)


def window_infer_pipelined(
    params: dict,
    windows: jax.Array,
    pipe_mesh,
    n_micro: int,
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    conv_impl: str = "xla",
) -> jax.Array:
    """:func:`window_infer` with the recurrence PIPELINED over devices.

    The window protocol is a T=seq_len recurrence per window, so the pipe
    maps time steps onto stages: device p runs steps [p*T/P, (p+1)*T/P) and
    window-microbatches flow through the stages via ``lax.ppermute``
    (parallel/pipeline.py) — microbatch m is in stage p while m+1 is in
    stage p-1.  Exactly equal to :func:`window_infer` (same op order, same
    state chain); requires T % pipe_size == 0 and n_micro | B.
    """
    fn = _pipelined_infer_fn(
        pipe_mesh, n_micro, use_cube_pad, compute_dtype, conv_impl, None
    )
    return fn(params, windows, None)


def window_infer_from_frames_pipelined(
    params: dict,
    frames: jax.Array,
    positions: jax.Array,
    pipe_mesh,
    n_micro: int,
    seq_len: int = 5,
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    conv_impl: str = "xla",
) -> jax.Array:
    """Pipelined form of :func:`window_infer_from_frames` (same on-device
    window assembly, recurrence pipelined over the pipe mesh)."""
    fn = _pipelined_infer_fn(
        pipe_mesh, n_micro, use_cube_pad, compute_dtype, conv_impl, seq_len
    )
    return fn(params, frames, positions)


@lru_cache(maxsize=32)
def _pipelined_infer_fn(pipe_mesh, n_micro: int, use_cube_pad: bool,
                        compute_dtype, conv_impl: str, seq_len):
    """Cached jitted graph for the pipelined window protocol.

    The whole chain — window gather (seq_len set), joint normalization,
    pipelined rollout, equi projection — runs as ONE jit: dispatched
    eagerly these ops are pathological on this libtpu (CLAUDE.md:
    standalone gathers/convs run orders of magnitude below their in-graph
    form), which would erase the pipelining win the config key exists to
    deliver.  ``seq_len=None`` builds the pre-stacked-windows form.
    """

    def fn(params, windows_or_frames, positions):
        if seq_len is not None:
            idx = positions[:, None] + jnp.arange(seq_len)[None, :]
            windows = windows_or_frames[idx]
        else:
            windows = windows_or_frames
        x, b = _normalize_windows(windows)
        h0 = c0 = x[0]
        _, h_final, _ = pipelined_rollout(
            params, x, h0, c0, pipe_mesh, n_micro,
            use_cube_pad=use_cube_pad, compute_dtype=compute_dtype,
            conv_impl=conv_impl,
        )
        return _project_hidden(h_final, b)

    return jax.jit(fn)  # positions=None is an empty pytree in the stacked form


@partial(jax.jit, static_argnames=("seq_len", "use_cube_pad", "compute_dtype", "conv_impl"))
def window_infer_from_frames(
    params: dict,
    frames: jax.Array,
    positions: jax.Array,
    seq_len: int = 5,
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    conv_impl: str = "xla",
) -> jax.Array:
    """Window inference with on-device window assembly.

    Stride-1 windows share seq_len-1 of their frames; transferring windows
    re-sends every frame ~seq_len times.  Here each frame crosses
    host->device ONCE: windows are sliced out of the frame range by a
    gather on device.

    Args:
      frames: [F, 6, h, w, C] consecutive CAM frames (any float dtype).
      positions: [B] int32 window start offsets into ``frames``
        (positions + seq_len <= F).

    Returns [B, 2h, 4w] predictions, identical to :func:`window_infer` on
    the equivalent stacked windows.
    """
    idx = positions[:, None] + jnp.arange(seq_len)[None, :]  # [B, T]
    windows = frames[idx]  # gather -> [B, T, 6, h, w, C]
    return window_infer(
        params, windows, use_cube_pad=use_cube_pad, compute_dtype=compute_dtype,
        conv_impl=conv_impl,
    )


@partial(jax.jit, static_argnames=("seq_len", "use_cube_pad", "compute_dtype", "conv_impl"))
def window_infer_from_frames_q(
    params: dict,
    q: jax.Array,
    scales: jax.Array,
    positions: jax.Array,
    seq_len: int = 5,
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    conv_impl: str = "xla",
) -> jax.Array:
    """:func:`window_infer_from_frames` fed by the int8 transfer codec.

    Frames arrive as (q int8 [F,6,h,w,C], scales f16/f32 [F,6,1,1,C]) — half
    the H2D bytes of the f16 form on the link-bound disk path
    (ops/quantize.py); the window gather runs on int8 (half the gather
    bytes too) and dequantization happens in-graph.
    """
    from cp360_tpu.ops.quantize import dequantize_cam

    idx = positions[:, None] + jnp.arange(seq_len)[None, :]  # [B, T]
    windows = dequantize_cam(q[idx], scales[idx])  # [B, T, 6, h, w, C] f32
    return window_infer(
        params, windows, use_cube_pad=use_cube_pad, compute_dtype=compute_dtype,
        conv_impl=conv_impl,
    )


def video_windows(feat_dir: str) -> List[int]:
    """Sorted artifact frame indices of a video's cube_feat directory.

    Window start positions are 0 .. N - seq_len - 1 in this sorted list,
    mirroring the reference loop bounds (test_temporal.py:57-63).
    """
    # strict NNNN.npy only: a crashed writer's leftovers or stray files
    # must never appear as (possibly duplicate) frame ids — a duplicate
    # would shift every later window off its GT id
    frames = sorted(
        int(m.group(1)) for m in
        (re.match(r"(\d+)\.npy$", f) for f in os.listdir(feat_dir)) if m
    )
    return frames


def infer_video(
    params: dict,
    feat_dir: str,
    seq_len: int,
    batch_windows: int = 64,
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    mesh=None,
    conv_impl: str = "xla",
    prefetch_depth: int = 3,
    transfer_codec: str = "none",
) -> Dict[int, np.ndarray]:
    """All window predictions for one video.

    Returns {window position idx: prediction [2h,4w]} where idx matches the
    reference's enumeration over the sorted frame list; the saved/eval frame
    id is idx + seq_len - 1 (test_temporal.py:86-88,101-102).

    With a ``mesh``, window positions shard along its data axis (frames are
    replicated — they're shared by overlapping windows) so each chip runs
    batch_windows / n_data windows.

    ``transfer_codec="int8"`` quantizes the loaded artifact frames on the
    IO thread (per face x channel, ops/quantize.py) so half the bytes cross
    the link-bound H2D; dequantization runs in-graph.  Error is bounded
    (~0.4% of each channel's peak) and measured end-to-end in
    tests/test_quantize.py.
    """
    if mesh is not None:
        n_data = mesh.shape.get("data", 1)
        if batch_windows % n_data:
            raise ValueError(
                f"batch_windows={batch_windows} must be divisible by the mesh "
                f"data axis ({n_data} devices) so window positions shard evenly"
            )
    frame_ids = video_windows(feat_dir)
    n = len(frame_ids)
    n_windows = max(0, n - seq_len)
    out: Dict[int, np.ndarray] = {}
    if n_windows == 0:
        return out

    def load_frames(p0: int, p1: int) -> np.ndarray:
        """Frames [p0, p1) in artifact dtype (f16 transfers at half cost),
        NHWC, via the native batch loader when available."""
        paths = [os.path.join(feat_dir, f"{frame_ids[p]:06}.npy") for p in range(p0, p1)]
        first = np.load(paths[0], mmap_mode="r")
        try:
            from cp360_tpu.native import load_npy_batch

            arr = load_npy_batch(paths, first.shape, first.dtype)
        except Exception:
            arr = np.stack([np.load(p) for p in paths])
        return np.ascontiguousarray(arr.transpose(0, 1, 3, 4, 2))  # [F,6,h,w,C]

    # fixed shapes for one compilation: F = batch + seq_len - 1 frames/batch
    f_fixed = batch_windows + seq_len - 1

    def prepare(b0: int):
        """Disk-load + pad one batch's frames (runs on the IO thread);
        with the int8 codec, quantization also runs here so it overlaps
        disk reads and the previous batch's compute."""
        b1 = min(b0 + batch_windows, n_windows)
        frames = load_frames(b0, min(b0 + f_fixed, n))
        valid = b1 - b0
        if frames.shape[0] < f_fixed:  # pad tail batch to keep shapes static
            reps = np.repeat(frames[-1:], f_fixed - frames.shape[0], axis=0)
            frames = np.concatenate([frames, reps], axis=0)
        positions = np.minimum(np.arange(batch_windows), valid - 1).astype(np.int32)
        if transfer_codec == "int8":
            from cp360_tpu.ops.quantize import quantize_cam_np

            # f16 scales: transfer-only (dequantized in-graph right after
            # H2D) — shaves ~4% more off the link bytes at <=2^-11
            # step-size change (ops/quantize.py)
            return b0, valid, quantize_cam_np(frames, np.float16), positions
        return b0, valid, frames, positions

    # prefetch ring: up to ``prefetch_depth`` batches of artifacts are read
    # from disk ahead of the compute stream, riding out the tunnel's
    # multi-second latency spikes; H2D is deferred-device_put (cheap at
    # call time) and D2H is async from dispatch (utils/transfer.py), so
    # disk read / H2D / compute / D2H of neighboring batches all overlap
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    starts = list(range(0, n_windows, batch_windows))
    depth = max(1, prefetch_depth)
    with ThreadPoolExecutor(max_workers=min(2, depth)) as io_pool:
        prep_q: deque = deque()
        next_s = 0
        while next_s < len(starts) and len(prep_q) < depth:
            prep_q.append(io_pool.submit(prepare, starts[next_s]))
            next_s += 1
        pending = None  # (b0, valid, preds device array)

        def flush(pending):
            if pending is None:
                return
            b0, valid, preds_dev = pending
            from cp360_tpu.utils.transfer import fetch_np

            preds = fetch_np(preds_dev)
            for k in range(valid):
                out[b0 + k] = preds[k]

        for i in range(len(starts)):
            b0, valid, payload, positions = prep_q.popleft().result()
            if next_s < len(starts):
                prep_q.append(io_pool.submit(prepare, starts[next_s]))
                next_s += 1
            arrays = payload if transfer_codec == "int8" else (payload,)
            dev = [jnp.asarray(a) for a in arrays]
            pos_dev = jnp.asarray(positions)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                dev = [jax.device_put(a, NamedSharding(mesh, P())) for a in dev]
                pos_dev = jax.device_put(pos_dev, NamedSharding(mesh, P("data")))
            if transfer_codec == "int8":
                preds_dev = window_infer_from_frames_q(
                    params, dev[0], dev[1], pos_dev,
                    seq_len=seq_len, use_cube_pad=use_cube_pad,
                    compute_dtype=compute_dtype, conv_impl=conv_impl,
                )
            else:
                preds_dev = window_infer_from_frames(
                    params, dev[0], pos_dev,
                    seq_len=seq_len, use_cube_pad=use_cube_pad,
                    compute_dtype=compute_dtype, conv_impl=conv_impl,
                )
            from cp360_tpu.utils.transfer import async_start

            async_start(preds_dev)  # D2H overlaps the next batch's work
            flush(pending)
            pending = (b0, valid, preds_dev)
        flush(pending)
    return out


def evaluate_video(
    preds: Dict[int, np.ndarray],
    gt_dir: str,
    seq_len: int,
    rng=None,
) -> Dict[str, np.ndarray]:
    """Score window predictions against GT fixation maps.

    GT file for window idx is {idx + seq_len - 1:05}.npy
    (test_temporal.py:101-102).
    """
    auc, aucb, cc, sim = [], [], [], []
    for idx in sorted(preds):
        gt_path = os.path.join(gt_dir, f"{idx + seq_len - 1:05}.npy")
        if not os.path.exists(gt_path):
            continue
        gt = np.load(gt_path)
        p = preds[idx]
        auc.append(M.auc_judd(p, gt, rng=rng))
        aucb.append(M.auc_borji(p, gt, rng=rng))
        cc.append(M.corr_coeff(p, gt))
        sim.append(M.similarity(p, gt))
    return {
        "AUC": np.asarray(auc),
        "AUCB": np.asarray(aucb),
        "CC": np.asarray(cc),
        "SIM": np.asarray(sim),
    }


def aggregate(per_video: Dict[str, Dict[str, np.ndarray]], frame_counts: Dict[str, int]):
    """Frame-count-weighted mean of per-video means
    (test_temporal.py:180-184)."""
    vids = list(per_video)
    total = sum(frame_counts[v] for v in vids)
    agg = {}
    for key in ("AUC", "AUCB", "CC", "SIM"):
        agg[key] = float(
            sum(np.mean(per_video[v][key]) * frame_counts[v] / total for v in vids)
        )
    return agg
