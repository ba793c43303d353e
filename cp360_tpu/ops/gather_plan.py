"""Static planning for the TPU slot-gather resampler (equi -> cube faces).

The device equi->cube path is a 301k-pixel bilinear gather that XLA lowers
pathologically on this TPU (~66 ms/frame measured round 2 — large gathers
of short rows, ops/resample.py:88-91).  Mosaic *does* expose the hardware
gather units, but only register-locally: within-row (lane) gathers compile
at width 128 and within-column (sublane) gathers at height 8
(tpu.dynamic_gather; measured envelope, round 3).  A general 2-D bilinear
resample therefore runs as THREE aligned gather phases, with all the
irregularity moved into static host-side planning:

  phase 1 (azimuth): per source row y, gather the set of distinct source
    columns any output tap needs from row y into K "slots":
        G[y, k] = src[y, A1[y, k]].
    A row can need at most W distinct columns, so K = next_multiple_128(
    max demand) always suffices.  Lane-hierarchical: 128-wide gathers +
    masked select over column groups.
  phase 2 (row distribution): every output row r picks, per slot k, the
    source row its tap at slot k lives in:
        T[r, k] = G[Y2[r, k], k].
    Sublane-banded: each 8-row output chunk touches a bounded band of
    source rows (precomputed), looped in sub-bands of 8.
  phase 3 (un-permute + blend): output pixel (r, c) reads its 4 bilinear
    taps from T[r, S3[r, 4c:4c+4]] (static indices) and blends with the
    bilinear weights.  Static lane-hierarchical gather.

The one planning constraint is slot ALIGNMENT: tap (y, x) must occupy the
same slot k in phase 1 (A1[y, k] = x) and in every output row that needs
it.  Two taps of one output row colliding on a slot cannot both live in
T[r, k]; the planner packs slots greedily to avoid collisions and spills
the residue to a second layer (an independent Y2'/T' with its own
phase-2 pass).  Feasibility is asserted at plan time.

Reference analogue: utils/equi_to_cube.py:112-129 (host cv2.remap); the
plan reproduces its exact bilinear semantics (same maps, same clamping).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class GatherPlan:
    """Static tables for one (source shape, sampling map) geometry."""

    src_h: int
    src_w: int
    out_rows: int  # stacked output rows (e.g. 6 faces x cube_dim)
    out_cols: int
    k_slots: int
    n_layers: int
    a1: np.ndarray  # [src_h, K] i32 — slot azimuths per source row
    y2: np.ndarray  # [L, out_rows, K] i32 — phase-2 source-row indices
    s3: np.ndarray  # [out_rows, 4 * out_cols] i32 — slot index per tap
    l3: np.ndarray  # [out_rows, 4 * out_cols] i8 — layer index per tap
    w3: np.ndarray  # [out_rows, 4 * out_cols] f32 — bilinear tap weights
    band_lo: np.ndarray  # [L, n_chunks] i32 — per-8-row-chunk band start
    band_n: np.ndarray  # [L, n_chunks] i32 — per-chunk band count (of 8)

    @property
    def n_chunks(self) -> int:
        return self.y2.shape[1] // 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_plan(map_x: np.ndarray, map_y: np.ndarray, src_h: int, src_w: int,
               n_layers: int = 2) -> GatherPlan:
    """Plan tables from float sampling maps.

    Args:
      map_x/map_y: [R, C] float source coordinates per output pixel
        (already clamped to [0, src_w-1] / [0, src_h-1] like the oracle).
    """
    r_out, c_out = map_x.shape
    # f32 coordinate math, mirroring the device oracle
    # (ops/resample.py::_bilinear_gather casts coords to f32 before floor)
    map_x = np.asarray(map_x, np.float32)
    map_y = np.asarray(map_y, np.float32)
    x0 = np.floor(map_x).astype(np.int64)
    y0 = np.floor(map_y).astype(np.int64)
    fx = (map_x - x0).astype(np.float32)
    fy = (map_y - y0).astype(np.float32)
    x1 = np.minimum(x0 + 1, src_w - 1)
    y1 = np.minimum(y0 + 1, src_h - 1)

    # 4 taps per output pixel: (y, x, w) with bilinear weights
    tap_y = np.stack([y0, y0, y1, y1], axis=0)  # [4, R, C]
    tap_x = np.stack([x0, x1, x0, x1], axis=0)
    tap_w = np.stack(
        [(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx], axis=0
    ).astype(np.float32)

    # ---- phase-1 packing: distinct azimuths per source row -> slots ----
    # order slots by azimuth (stable, reproducible); K covers max demand
    pairs = np.unique(tap_y.ravel() * src_w + tap_x.ravel())  # sorted (y, x)
    pair_y = pairs // src_w
    pair_x = pairs % src_w
    row_start = np.searchsorted(pair_y, np.arange(src_h + 1))
    demand = int(np.max(np.diff(row_start))) if len(pairs) else 1
    k_slots = max(128, _round_up(demand, 128))
    # Rank-in-row packing with a golden-ratio per-row rotation: adjacent
    # source rows carry near-identical azimuth sets at near-identical
    # ranks, so un-rotated packing would collide the (y0, x)/(y1, x)
    # vertical tap pair of every output pixel onto one slot (measured: 8
    # layers needed at 224/960 vs 3 with the rotation).  Same-row cells
    # can never collide (distinct ranks); the rotation decorrelates rows.
    rank = (np.arange(len(pairs)) - row_start[pair_y]).astype(np.int64)
    rot = (pair_y * 0.61803398875 * k_slots).astype(np.int64) % k_slots
    pair_slot = (rank + rot) % k_slots
    a1 = np.zeros((src_h, k_slots), np.int32)
    a1[pair_y, pair_slot] = pair_x

    # (y, x) -> slot lookup via searchsorted into the sorted pair list
    def slot_of_arr(ys, xs):
        idx = np.searchsorted(pairs, ys * src_w + xs)
        return pair_slot[idx]

    # ---- phase-2/3 assignment with layer spill -------------------------
    # tap layout is TAP-MAJOR with the per-tap column block padded to a
    # multiple of 128: j = t * c_pad + c.  The kernel's 4-tap reduction is
    # then four 128-aligned lane slices (Mosaic cannot reshape the lane
    # dim, and interleaved taps would need a stride-4 lane slice).
    c_pad = _round_up(c_out, 128)
    y2 = np.zeros((n_layers, r_out, k_slots), np.int32)
    used = np.zeros((n_layers, r_out, k_slots), bool)
    s3 = np.zeros((r_out, 4 * c_pad), np.int32)
    l3 = np.zeros((r_out, 4 * c_pad), np.int8)
    w3 = np.zeros((r_out, 4 * c_pad), np.float32)
    cpos = (np.arange(4)[:, None] * c_pad + np.arange(c_out)[None, :]).ravel()
    for r in range(r_out):
        # real tap positions within the padded row (padding keeps w3 = 0)
        ys_r = tap_y[:, r, :].ravel()
        xs_r = tap_x[:, r, :].ravel()
        w3[r, cpos] = tap_w[:, r, :].ravel()
        keys = ys_r * src_w + xs_r
        # dedupe (y, x) within the row: identical taps share one cell
        ukeys, inv = np.unique(keys, return_inverse=True)
        uy = ukeys // src_w
        ux = ukeys % src_w
        uk = slot_of_arr(uy, ux)
        # layer = occurrence rank among unique cells sharing a slot
        order = np.argsort(uk, kind="stable")
        k_sorted = uk[order]
        first = np.r_[True, k_sorted[1:] != k_sorted[:-1]]
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(uk)), 0))
        lyr_sorted = np.arange(len(uk)) - group_start
        ulyr = np.empty(len(uk), np.int64)
        ulyr[order] = lyr_sorted
        if len(uk) and ulyr.max() >= n_layers:
            raise ValueError(
                f"slot collision overflow at out row {r}: need "
                f"{int(ulyr.max()) + 1} layers > {n_layers}"
            )
        y2[ulyr, r, uk] = uy
        used[ulyr, r, uk] = True
        s3[r, cpos] = uk[inv]
        l3[r, cpos] = ulyr[inv]

    # ---- phase-2 band bounds per 8-row chunk ---------------------------
    rows_pad = _round_up(r_out, 8)
    if rows_pad != r_out:
        pad = rows_pad - r_out
        y2 = np.pad(y2, ((0, 0), (0, pad), (0, 0)))
        used_pad = np.pad(used, ((0, 0), (0, pad), (0, 0)))
        s3 = np.pad(s3, ((0, pad), (0, 0)))
        l3 = np.pad(l3, ((0, pad), (0, 0)))
        w3 = np.pad(w3, ((0, pad), (0, 0)))
    else:
        used_pad = used
    n_chunks = rows_pad // 8
    band_lo = np.zeros((n_layers, n_chunks), np.int32)
    band_n = np.zeros((n_layers, n_chunks), np.int32)
    for lyr in range(n_layers):
        for ch in range(n_chunks):
            sel = used_pad[lyr, ch * 8:(ch + 1) * 8]
            ys = y2[lyr, ch * 8:(ch + 1) * 8][sel]
            if len(ys) == 0:
                band_lo[lyr, ch] = 0
                band_n[lyr, ch] = 1
                continue
            lo = (int(ys.min()) // 8) * 8
            hi = int(ys.max())
            band_lo[lyr, ch] = lo
            band_n[lyr, ch] = (hi - lo) // 8 + 1
    return GatherPlan(
        src_h=src_h, src_w=src_w, out_rows=rows_pad, out_cols=c_out,
        k_slots=k_slots, n_layers=n_layers, a1=a1, y2=y2, s3=s3, l3=l3,
        w3=w3, band_lo=band_lo, band_n=band_n,
    )


def apply_plan_np(plan: GatherPlan, src: np.ndarray) -> np.ndarray:
    """NumPy executor — the correctness oracle for the kernel phases.

    Args:
      src: [src_h, src_w] one channel.

    Returns [out_rows, out_cols] resampled output (padded rows included).
    """
    g = src[np.arange(plan.src_h)[:, None], plan.a1]  # [src_h, K]
    outs = []
    for lyr in range(plan.n_layers):
        outs.append(g[plan.y2[lyr], np.arange(plan.k_slots)[None, :]])
    t = np.stack(outs)  # [L, out_rows, K]
    taps = t[plan.l3, np.arange(plan.out_rows)[:, None], plan.s3]
    c_pad = plan.s3.shape[1] // 4
    out = (taps * plan.w3).reshape(plan.out_rows, 4, c_pad).sum(1)
    return out[:, : plan.out_cols].astype(np.float32)
