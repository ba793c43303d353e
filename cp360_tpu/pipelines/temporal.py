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
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.metrics import saliency as M
from cp360_tpu.models.clstm import clstm_rollout
from cp360_tpu.ops.resample import cube_to_equi


@partial(jax.jit, static_argnames=("use_cube_pad",))
def window_infer(params: dict, windows: jax.Array, use_cube_pad: bool = True) -> jax.Array:
    """Batched window inference.

    Args:
      windows: [B, T, 6, h, w, C] raw (un-normalized) CAM cubes.

    Returns [B, 2h, 4w] equi saliency predictions (f32).
    """
    b, t = windows.shape[0], windows.shape[1]
    mn = jnp.min(windows, axis=(1, 2, 3, 4, 5), keepdims=True)
    mx = jnp.max(windows, axis=(1, 2, 3, 4, 5), keepdims=True)
    norm = (windows - mn) / (mx - mn)

    x = jnp.moveaxis(norm, 1, 0).reshape(t, b * 6, *windows.shape[3:])
    h0 = c0 = x[0]
    _, h_final, _ = clstm_rollout(params, x, h0, c0, use_cube_pad=use_cube_pad)

    cubes = h_final.reshape(b, 6, *h_final.shape[1:])
    equi = cube_to_equi(cubes)  # [B, 2h, 4w, C]
    return jnp.max(equi, axis=-1)


def video_windows(feat_dir: str) -> List[int]:
    """Sorted artifact frame indices of a video's cube_feat directory.

    Window start positions are 0 .. N - seq_len - 1 in this sorted list,
    mirroring the reference loop bounds (test_temporal.py:57-63).
    """
    frames = sorted(
        int(f.split(".")[0]) for f in os.listdir(feat_dir) if f.endswith(".npy")
    )
    return frames


def infer_video(
    params: dict,
    feat_dir: str,
    seq_len: int,
    batch_windows: int = 64,
    use_cube_pad: bool = True,
) -> Dict[int, np.ndarray]:
    """All window predictions for one video.

    Returns {window position idx: prediction [2h,4w]} where idx matches the
    reference's enumeration over the sorted frame list; the saved/eval frame
    id is idx + seq_len - 1 (test_temporal.py:86-88,101-102).
    """
    frames = video_windows(feat_dir)
    n = len(frames)
    n_windows = max(0, n - seq_len)
    out: Dict[int, np.ndarray] = {}
    if n_windows == 0:
        return out

    cache: Dict[int, np.ndarray] = {}

    def load(pos: int) -> np.ndarray:
        if pos not in cache:
            arr = np.load(os.path.join(feat_dir, f"{frames[pos]:06}.npy"))
            cache[pos] = arr.transpose(0, 2, 3, 1).astype(np.float32)  # -> NHWC
        return cache[pos]

    for b0 in range(0, n_windows, batch_windows):
        idxs = list(range(b0, min(b0 + batch_windows, n_windows)))
        batch = np.stack(
            [np.stack([load(i + t) for t in range(seq_len)]) for i in idxs]
        )
        # evict frames no longer needed
        for pos in list(cache):
            if pos < b0:
                del cache[pos]
        preds = np.asarray(window_infer(params, jnp.asarray(batch), use_cube_pad))
        for k, i in enumerate(idxs):
            out[i] = preds[k]
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
