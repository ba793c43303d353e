"""Dataset over stage-1 artifacts + a threaded prefetch loader.

Capability parity with the reference Sal360Dataset (data/dataset.py:13-83):
windows of ``seq_len`` consecutive CAM cubes + optical flows drawn from
``<root>/<vid>/cube_feat/*.npy`` and ``<root>/<vid>/motion/*.npy``, windows
restricted to start frames with index < max_index - seq_len + 1
(data/dataset.py:39).

Deltas:
- missing frame files raise a clear error instead of printing a warning and
  returning a ragged sequence (the reference would crash later,
  data/dataset.py:67-68);
- batching + shuffling + background prefetch are built in (the reference
  leans on torch DataLoader workers); batches are contiguous numpy arrays
  ready for device_put, with the CAM cubes already transposed to NHWC.
"""

from __future__ import annotations

import os
import queue
import re
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def read_split(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def builtin_split(name: str) -> List[str]:
    """The Wild-360 video-id splits shipped with the reference
    (data/test_25.txt, data/train_60.txt)."""
    here = os.path.join(os.path.dirname(__file__), "splits")
    return read_split(os.path.join(here, f"{name}.txt"))


class WindowDataset:
    """Indexable set of (video, start-frame) windows over stage-1 artifacts."""

    def __init__(
        self,
        feat_root: str,
        motion_root: Optional[str],
        video_ids: Sequence[str],
        seq_len: int,
        require_motion: bool = True,
    ):
        self.feat_root = feat_root
        self.motion_root = motion_root if motion_root is not None else feat_root
        self.seq_len = seq_len
        self.require_motion = require_motion
        self.windows: List[Tuple[str, int]] = []  # (video, start frame index)

        for vid in sorted(video_ids):
            feat_dir = os.path.join(feat_root, vid, "cube_feat")
            if not os.path.isdir(feat_dir):
                continue
            # strict NNNN.npy only — stray files (a crashed writer's
            # leftovers) must not become duplicate/phantom window starts
            frames = sorted(
                int(m.group(1)) for m in
                (re.match(r"(\d+)\.npy$", f) for f in os.listdir(feat_dir))
                if m
            )
            if not frames:
                continue
            max_len = frames[-1]
            for idx in frames:
                if idx < (max_len - seq_len + 1):
                    self.windows.append((vid, idx))

    def __len__(self) -> int:
        return len(self.windows)

    def _frame_path(self, root: str, vid: str, sub: str, idx: int) -> str:
        return os.path.join(root, vid, sub, f"{idx:06}.npy")

    def __getitem__(self, i: int):
        """Returns (seq [T,6,h,w,C] NHWC f32, flows [T,H,W,2] f32, vid, start)."""
        vid, start = self.windows[i]
        cams, flows = [], []
        for off in range(self.seq_len):
            fp = self._frame_path(self.feat_root, vid, "cube_feat", start + off)
            if not os.path.exists(fp):
                raise FileNotFoundError(f"missing CAM frame {fp}")
            cam = np.load(fp)  # reference layout [6, C, h, w]
            cams.append(cam.transpose(0, 2, 3, 1))
            if self.require_motion:
                mp = self._frame_path(self.motion_root, vid, "motion", start + off)
                if not os.path.exists(mp):
                    raise FileNotFoundError(f"missing flow frame {mp}")
                flows.append(np.load(mp))
        # artifact dtype is preserved (f16 artifacts halve host->device
        # bytes); device code upcasts to f32 before math
        seq = np.stack(cams)
        flow = np.stack(flows) if flows else np.zeros((self.seq_len, 0, 0, 2), np.float32)
        return seq, flow, vid, start

    def _probe_shapes(self):
        """(cam shape+dtype, flow shape+dtype) from the first window's files."""
        vid, start = self.windows[0]
        cam = np.load(self._frame_path(self.feat_root, vid, "cube_feat", start), mmap_mode="r")
        flow = None
        if self.require_motion:
            flow = np.load(self._frame_path(self.motion_root, vid, "motion", start), mmap_mode="r")
        return (cam.shape, cam.dtype), (flow.shape, flow.dtype) if flow is not None else None

    def get_batch(self, idxs, n_threads: int = 0):
        """Batched window load via the native loader (GIL-free file reads).

        Returns (seq [B,T,6,h,w,C] f32, flows [B,T,H,W,2] f32).  Falls back
        to per-item numpy loading if the native library is unavailable.
        """
        try:
            from cp360_tpu.native import load_npy_batch

            (cam_shape, cam_dtype), flow_info = self._probe_shapes()
        except Exception:
            items = [self[int(i)] for i in idxs]
            return (
                np.stack([it[0] for it in items]),
                np.stack([it[1] for it in items]),
            )

        b, t = len(idxs), self.seq_len
        cam_paths, flow_paths = [], []
        for i in idxs:
            vid, start = self.windows[int(i)]
            for off in range(t):
                cam_paths.append(self._frame_path(self.feat_root, vid, "cube_feat", start + off))
                if self.require_motion:
                    flow_paths.append(self._frame_path(self.motion_root, vid, "motion", start + off))

        cams = load_npy_batch(cam_paths, cam_shape, cam_dtype, n_threads)
        cams = cams.reshape(b, t, *cam_shape)
        # reference layout [6, C, h, w] -> NHWC; artifact dtype preserved
        seq = np.ascontiguousarray(cams.transpose(0, 1, 2, 4, 5, 3))
        if self.require_motion:
            (flow_shape, flow_dtype) = flow_info
            flows = load_npy_batch(flow_paths, flow_shape, flow_dtype, n_threads)
            flows = flows.reshape(b, t, *flow_shape)
        else:
            flows = np.zeros((b, t, 0, 0, 2), np.float32)
        return seq, flows


class SegmentWindowDataset:
    """Groups of ``group`` consecutive windows loaded as ONE frame run.

    Segment (vid, s) covers windows s .. s+group-1, i.e. frames
    s .. s+F-1 with F = group + seq_len - 1: each frame's CAM/flow is read
    and shipped once instead of up to seq_len times (the reference loads
    every window independently, data/dataset.py:53-80, so a stride-1 epoch
    reads each frame ~seq_len times).  The train step re-assembles the
    stride-1 windows in-graph (train/loop.py::expand_segments) — the
    optimizer update is identical to feeding the windows directly.

    Segments only span runs of consecutive start indices of the base
    dataset (a gap in the artifact numbering ends the run); ragged run
    tails of fewer than ``group`` windows are dropped to keep batch shapes
    static.
    """

    def __init__(self, base: WindowDataset, group: int):
        if group < 1:
            raise ValueError(f"group must be >= 1, got {group}")
        self.base = base
        self.group = group
        self.seq_len = base.seq_len
        self.segments: List[Tuple[str, int]] = []  # (vid, first start index)
        run: List[int] = []
        prev_vid = None

        def flush(vid, starts):
            for i in range(0, len(starts) - group + 1, group):
                self.segments.append((vid, starts[i]))

        for vid, start in base.windows:  # sorted per video, ascending starts
            if vid != prev_vid or (run and start != run[-1] + 1):
                if run:
                    flush(prev_vid, run)
                run = []
                prev_vid = vid
            run.append(start)
        if run:
            flush(prev_vid, run)

    def __len__(self) -> int:
        return len(self.segments)

    @property
    def n_windows(self) -> int:
        return len(self.segments) * self.group

    def get_batch(self, idxs, n_threads: int = 0):
        """Batch of segments -> (seq [S, F, 6, h, w, C], flows [S, F, H, W, 2])
        with F = group + seq_len - 1 (native loader when available)."""
        b = self.base
        f = self.group + self.seq_len - 1
        cam_paths, flow_paths = [], []
        for i in idxs:
            vid, start = self.segments[int(i)]
            for off in range(f):
                cam_paths.append(b._frame_path(b.feat_root, vid, "cube_feat", start + off))
                if b.require_motion:
                    flow_paths.append(b._frame_path(b.motion_root, vid, "motion", start + off))

        s = len(idxs)
        try:
            from cp360_tpu.native import load_npy_batch

            (cam_shape, cam_dtype), flow_info = b._probe_shapes()
        except Exception:
            for p in cam_paths:
                if not os.path.exists(p):
                    raise FileNotFoundError(f"missing CAM frame {p}")
            for p in flow_paths:
                if not os.path.exists(p):
                    raise FileNotFoundError(f"missing flow frame {p}")
            cams = np.stack([np.load(p) for p in cam_paths])
            cams = cams.reshape(s, f, *cams.shape[1:])
            seq = np.ascontiguousarray(cams.transpose(0, 1, 2, 4, 5, 3))
            if b.require_motion:
                flows = np.stack([np.load(p) for p in flow_paths])
                flows = flows.reshape(s, f, *flows.shape[1:])
            else:
                flows = np.zeros((s, f, 0, 0, 2), np.float32)
            return seq, flows

        cams = load_npy_batch(cam_paths, cam_shape, cam_dtype, n_threads)
        cams = cams.reshape(s, f, *cam_shape)
        seq = np.ascontiguousarray(cams.transpose(0, 1, 2, 4, 5, 3))
        if b.require_motion:
            (flow_shape, flow_dtype) = flow_info
            flows = load_npy_batch(flow_paths, flow_shape, flow_dtype, n_threads)
            flows = flows.reshape(s, f, *flow_shape)
        else:
            flows = np.zeros((s, f, 0, 0, 2), np.float32)
        return seq, flows


class PrefetchLoader:
    """Shuffled, batched, background-prefetching iterator over a dataset.

    Host-side double buffering so the device never waits on .npy reads
    (the analogue of the reference's DataLoader(num_workers=4),
    temporal_model/train_temporal.py:232-233).
    """

    def __init__(
        self,
        dataset: WindowDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        transfer_codec: str = "none",
        rows: "slice | None" = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.drop_last = drop_last
        # 'int8': yield the CAM windows as ops.quantize.Quantized pytrees
        # (int8 + scales, dequantized in-graph by the train step) and the
        # f32 flow planes as f16 — the flows (~18.4 MB/window, the dominant
        # training H2D) cross the link at half the bytes with ~0.01 px
        # error, safe against the absolute mm_th motion threshold (int8's
        # peak-relative step is not; see load_batch).  Codec work runs on
        # this loader's worker thread, overlapping device compute.
        self.transfer_codec = transfer_codec
        # multi-host IO scale-out: load only THIS host's span of every
        # global batch (parallel/mesh.local_rows_slice) — the global index
        # order stays identical on every host (seeded shuffle), so the
        # sliced batches jointly assemble the exact global batch through
        # shard_batch_per_host.  Quantization scales are per-sample, so
        # per-host quantization is bit-identical to global.
        self.rows = rows
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        it = self.iter_epoch(self._epoch)
        self._epoch += 1
        return it

    def iter_epoch(
        self, epoch: int, skip_batches: int = 0
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """The epoch's batches in a DETERMINISTIC order seeded by
        ``seed + epoch`` — independent of this loader's iteration history,
        so a resumed process replays the exact order the uninterrupted run
        would have used (plain ``__iter__`` counts epochs from process
        start, which diverges after a restart).  ``skip_batches`` drops the
        first k batches WITHOUT reading their files — the train loop uses
        it to continue a mid-epoch checkpoint at the next unseen batch.
        """
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)

        nb = len(self)
        if not 0 <= skip_batches <= nb:
            raise ValueError(f"skip_batches={skip_batches} not in [0, {nb}]")
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(skip_batches, nb)
        ]
        if self.rows is not None:
            if not self.drop_last:
                raise ValueError(
                    "per-host row slicing (rows=...) requires drop_last=True "
                    "— a short final batch would break the span contract")
            batches = [b[self.rows] for b in batches]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_batch(idxs):
            seq, flows = self.ds.get_batch(idxs, n_threads=self.num_threads)
            if self.transfer_codec == "int8":
                from cp360_tpu.ops.quantize import Quantized, quantize_cam_np

                seq = Quantized(*quantize_cam_np(seq))
                if flows.size:  # require_motion=False yields empty planes
                    # Flow travels f16, NOT int8: the motion mask thresholds
                    # |flow| against the ABSOLUTE mm_th (0.15 px), while the
                    # int8 step is amax/127 of the window's own peak — a
                    # ~20 px peak gives a 0.157 px step, collapsing the
                    # "static" mask to exact zeros.  f16 keeps the error
                    # ~0.01 px there and still halves the dominant H2D.
                    flows = flows.astype(np.float16)
            return seq, flows

        def put(item) -> bool:
            """Queue put that gives up when the consumer stopped iterating."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    if not put(load_batch(idxs)):
                        return
                put(None)
            except Exception as e:  # surface loader errors to the consumer
                put(e)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
