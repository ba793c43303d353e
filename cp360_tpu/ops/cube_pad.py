"""Cube padding — the paper's core op — as a single precomputed gather.

Reference semantics: model/cube_pad.py:45-216.  Each of the 6 cube faces is
padded with pixel strips taken from its 4 neighbour faces (flipped/transposed
to match edge orientation), with the 4 corner blocks filled by replicating
the adjacent edge strip of the top/down plates.  Face order is B D F L R T
(back, down, front, left, right, top), matching cp360_tpu.geometry.sph.

TPU-first design: for a given (H, W, pads) the padded output is a *fixed
permutation with replication* of the input pixels.  We therefore compute,
once per shape (cached), an int32 index map ``src[6, H+pt+pd, W+pl+pr]``
into the flattened [6*H*W] face-pixel axis; the runtime op is one
``jnp.take`` — a single XLA gather, no slicing/concat chains, no Python
loops over the batch (the reference loops per cube, model/cube_pad.py:36-41).

The index map itself is built by running the neighbour-strip slice/flip/
transpose logic *on an array of linear indices* — so the gather map is, by
construction, exactly the permutation the reference's tensor-level ops
produce.

Autodiff: gather has a clean transpose (scatter-add), so this op is fully
differentiable — needed for the ConvLSTM training path.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Pads = Union[int, Sequence[int]]

# Execution form for :func:`cube_pad` — "explicit" (slice/flip/concat),
# "dus" (zero-pad + strip writes), or "gather" (index-map take).  All three
# are exact-equal (tests/test_cube_pad.py); the default is the form that
# measured fastest inside the stage-1 backbone on the real chip
# (tools/bench_cubepad_forms.py).  Env CP360_CUBE_PAD_FORM overrides, read
# at import (the choice is baked into traces — one form per process).
import os as _os

CUBE_PAD_FORM = _os.environ.get("CP360_CUBE_PAD_FORM", "")
if CUBE_PAD_FORM not in ("", "explicit", "dus", "gather"):
    # fail at import, not silently at dispatch: a typo'd form would
    # otherwise fall through to "explicit" and an A/B sweep would
    # unknowingly benchmark the wrong form (ADVICE r4)
    raise ValueError(
        f"CP360_CUBE_PAD_FORM={CUBE_PAD_FORM!r} is not one of "
        f"'', 'explicit', 'dus', 'gather'")

# stem-pool execution form (cube_pad_max_pool_3x3s2): 'fused2d' is one 2-D
# overlapping reduce_window; 'separable' splits it into a 3x1 row pass then
# a 1x3 col pass (exact — max is separable).  A/B'd on-chip by
# tools/bench_pool_forms.py; same import-time validation as the pad form.
POOL_FORM = _os.environ.get("CP360_POOL_FORM", "")
if POOL_FORM not in ("", "fused2d", "fused2d_dus", "separable", "pairmax"):
    raise ValueError(
        f"CP360_POOL_FORM={POOL_FORM!r} is not one of "
        f"'', 'fused2d', 'fused2d_dus', 'separable', 'pairmax'")

# Bottleneck 3x3 cube-conv execution form (cube_pad_conv3x3): 'pad'
# materializes cube_pad(x, 1) then convolves VALID; 'halo' runs a zero-pad
# conv (interior exact — the halo taps hit zeros) plus thin border-strip
# correction convs gathered off the index map, never building the padded
# tensor.  A/B'd on-chip by tools/bench_cube_conv.py.
CUBE_CONV_FORM = _os.environ.get("CP360_CUBE_CONV_FORM", "")
if CUBE_CONV_FORM not in ("", "pad", "halo"):
    raise ValueError(
        f"CP360_CUBE_CONV_FORM={CUBE_CONV_FORM!r} is not one of "
        f"'', 'pad', 'halo'")

# How the fused pool/conv extract their halo strips: 'gather' = one
# jnp.take off the index map; 'slice' = the explicit plate construction
# (contiguous neighbour-edge slices + flips).  Measured on-chip r5: slice
# runs the full fused stage-1 graph at 899.1 fps vs gather's 848.7 (the
# known short-C-row gather pathology of this libtpu, CLAUDE.md) — slice
# is the default.
HALO_SOURCE = _os.environ.get("CP360_HALO_SOURCE", "")
if HALO_SOURCE not in ("", "gather", "slice"):
    raise ValueError(
        f"CP360_HALO_SOURCE={HALO_SOURCE!r} is not one of "
        f"'', 'gather', 'slice'")


def get_pad_size(lrtd_pad: Pads) -> Tuple[int, int, int, int]:
    """Normalize pad spec to (left, right, top, down).

    Reference: model/cube_pad.py:12-20 (an int means uniform padding).
    """
    if isinstance(lrtd_pad, (int, np.integer)):
        return (int(lrtd_pad),) * 4
    p_l, p_r, p_t, p_d = (int(p) for p in lrtd_pad)
    return p_l, p_r, p_t, p_d


# ---------------------------------------------------------------------------
# Host-side index-map construction (NumPy, cached per shape).
# ---------------------------------------------------------------------------


def _build_plates(faces: np.ndarray, p_l: int, p_r: int, p_t: int, p_d: int):
    """Neighbour-strip plates for each face, on an arbitrary per-face array.

    ``faces`` is [6, H, W] (here: linear indices).  Returns dict of plates
    top/down [6, p, W] and left/right [6, H, p] (None when pad is 0).
    Strip choices mirror reference model/cube_pad.py:114-162; `[::-1]` on an
    axis is the reference's flip(), `.T`-style swapaxes is its permute.
    """
    b, d, f, l, r, t = faces  # noqa: E741 — face initials match the paper

    top = down = left = right = None
    if p_t:
        top = np.stack(
            [
                t[:p_t, :][:, ::-1],  # back   <- top's top rows, W-flipped
                f[-p_t:, :],  # down   <- front's bottom rows
                t[-p_t:, :],  # front  <- top's bottom rows
                t[:, :p_t].swapaxes(0, 1),  # left <- top's left cols, transposed
                t[:, -p_t:].swapaxes(0, 1)[:, ::-1],  # right <- top's right cols, transposed + W-flip
                b[:p_t, :][:, ::-1],  # top    <- back's top rows, W-flipped
            ]
        )
    if p_d:
        down = np.stack(
            [
                d[-p_d:, :][:, ::-1],  # back  <- down's bottom rows, W-flipped
                b[-p_d:, :][:, ::-1],  # down  <- back's bottom rows, W-flipped
                d[:p_d, :],  # front <- down's top rows
                d[:, :p_d].swapaxes(0, 1)[:, ::-1],  # left <- down's left cols, transposed + W-flip
                d[:, -p_d:].swapaxes(0, 1),  # right <- down's right cols, transposed
                f[:p_d, :],  # top   <- front's top rows
            ]
        )
    if p_l:
        left = np.stack(
            [
                r[:, -p_l:],  # back  <- right's right cols
                l[-p_l:, :].swapaxes(0, 1)[::-1, :],  # down <- left's bottom rows, transposed + H-flip
                l[:, -p_l:],  # front <- left's right cols
                b[:, -p_l:],  # left  <- back's right cols
                f[:, -p_l:],  # right <- front's right cols
                l[:p_l, :].swapaxes(0, 1),  # top   <- left's top rows, transposed
            ]
        )
    if p_r:
        right = np.stack(
            [
                l[:, :p_r],  # back  <- left's left cols
                r[-p_r:, :].swapaxes(0, 1),  # down <- right's bottom rows, transposed
                r[:, :p_r],  # front <- right's left cols
                f[:, :p_r],  # left  <- front's left cols
                b[:, :p_r],  # right <- back's left cols
                r[:p_r, :].swapaxes(0, 1)[::-1, :],  # top <- right's top rows, transposed + H-flip
            ]
        )
    return top, down, left, right


def _corner(feat_td: np.ndarray, feat_lr: np.ndarray) -> np.ndarray:
    """Corner block by edge replication (reference model/cube_pad.py:83-90).

    feat_td: [6, td_pad, 1] column slice of the top/down plate.
    feat_lr: [6, 1, lr_pad] row slice of the left/right plate.
    The larger pad dimension wins; on ties the td strip is column-tiled.
    """
    td_pad = feat_td.shape[1]
    lr_pad = feat_lr.shape[2]
    if td_pad > lr_pad:
        return np.tile(feat_lr, (1, td_pad, 1))
    return np.tile(feat_td, (1, 1, lr_pad))


@lru_cache(maxsize=64)
def build_cube_pad_index_map(h: int, w: int, lrtd_pad) -> np.ndarray:
    """int32 gather map [6, H+pt+pd, W+pl+pr] into the flat [6*H*W] axis."""
    p_l, p_r, p_t, p_d = get_pad_size(lrtd_pad)
    if (p_l or p_r or p_t or p_d) and h != w:
        # Transposed neighbour strips only line up on square faces.
        raise ValueError(f"cube padding requires square faces, got {h}x{w}")

    idx = np.arange(6 * h * w, dtype=np.int64).reshape(6, h, w)
    top, down, left, right = _build_plates(idx, p_l, p_r, p_t, p_d)

    # Corners (reference model/cube_pad.py:165-176).
    p_tr = _corner(top[:, -p_t:, -1:], right[:, :1, :p_r]) if (p_t and p_r) else None
    p_tl = _corner(top[:, :p_t, :1], left[:, :1, :p_l]) if (p_t and p_l) else None
    p_dr = _corner(down[:, -p_d:, -1:], right[:, -1:, -p_r:]) if (p_d and p_r) else None
    p_dl = _corner(down[:, :p_d, :1], left[:, -1:, -p_l:]) if (p_d and p_l) else None

    # Assemble (reference model/cube_pad.py:179-216): middle column gets the
    # top/down plates; the left/right columns span the full padded height
    # with their corners.
    mid = idx
    if p_t:
        mid = np.concatenate([top, mid], axis=1)
    if p_d:
        mid = np.concatenate([mid, down], axis=1)

    cols = []
    if p_l:
        lcol = left
        if p_tl is not None:
            lcol = np.concatenate([p_tl, lcol], axis=1)
        if p_dl is not None:
            lcol = np.concatenate([lcol, p_dl], axis=1)
        cols.append(lcol)
    cols.append(mid)
    if p_r:
        rcol = right
        if p_tr is not None:
            rcol = np.concatenate([p_tr, rcol], axis=1)
        if p_dr is not None:
            rcol = np.concatenate([rcol, p_dr], axis=1)
        cols.append(rcol)

    out = np.concatenate(cols, axis=2)
    assert out.shape == (6, h + p_t + p_d, w + p_l + p_r)
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# Runtime ops (JAX).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("lrtd_pad",))
def cube_pad(x: jax.Array, lrtd_pad: Pads) -> jax.Array:
    """Cube-pad a batch of cubemaps, NHWC.

    Args:
      x: [N, 6, H, W, C] (or [6, H, W, C]) array of cube faces in B D F L R T
         order.
      lrtd_pad: int or (left, right, top, down) pads.

    Returns [N, 6, H+pt+pd, W+pl+pr, C] padded faces.

    Implementation note: this dispatches to the slice/flip/concat formulation
    (:func:`cube_pad_explicit`) — on TPU the neighbour strips become
    contiguous copies running at HBM bandwidth.  The index-map gather
    formulation (:func:`cube_pad_gather`) is kept as the semantic ground
    truth and for testing, but XLA lowers large gathers of short rows
    (C-channel pixels) to a slow path: measured on v5e, the stem pad of a
    48-image batch costs ~3 ms explicit vs ~3 s (!) as a gather.
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    assert x.shape[1] == 6, f"expected a 6-face axis, got {x.shape[1]}"
    if x.shape[2] != x.shape[3]:
        # Same contract build_cube_pad_index_map enforces — checked here too
        # so the default (explicit) path fails with the designed message
        # instead of a cryptic stack-shape error deep in plate construction.
        raise ValueError(
            f"cube padding requires square faces, got {x.shape[2]}x{x.shape[3]}"
        )
    p_l, p_r, p_t, p_d = get_pad_size(lrtd_pad)
    if (p_l, p_r, p_t, p_d) == (0, 0, 0, 0):
        return x[0] if squeeze else x
    form = CUBE_PAD_FORM or "explicit"
    if form == "dus":
        out = cube_pad_dus(x, (p_l, p_r, p_t, p_d))
    elif form == "gather":
        out = cube_pad_gather(x, (p_l, p_r, p_t, p_d))
    else:
        out = cube_pad_explicit(x, (p_l, p_r, p_t, p_d))
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=("lrtd_pad",))
def cube_pad_gather(x: jax.Array, lrtd_pad: Pads) -> jax.Array:
    """Cube padding as one precomputed-index gather (semantic ground truth).

    Same signature/results as :func:`cube_pad`.  Prefer :func:`cube_pad` on
    TPU (see its note); the gather form is the 1:1 realization of the index
    map and what the Pallas selection matrices are built from.
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    n, six, h, w, c = x.shape
    assert six == 6, f"expected a 6-face axis, got {six}"
    p_l, p_r, p_t, p_d = get_pad_size(lrtd_pad)
    if (p_l, p_r, p_t, p_d) == (0, 0, 0, 0):
        return x[0] if squeeze else x

    idx = jnp.asarray(build_cube_pad_index_map(h, w, (p_l, p_r, p_t, p_d)))
    flat = x.reshape(n, 6 * h * w, c)
    out = jnp.take(flat, idx.reshape(-1), axis=1)
    out = out.reshape(n, 6, h + p_t + p_d, w + p_l + p_r, c)
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=("lrtd_pad",))
def cube_pad_nchw(x: jax.Array, lrtd_pad: Pads) -> jax.Array:
    """Reference-call-shape convenience: [6N, C, H, W] -> padded [6N, C, ...].

    Mirrors the reference module's API (model/cube_pad.py:28-42: batches are
    6N face-major) for users porting call sites; new code should use the
    NHWC :func:`cube_pad`.
    """
    n6, c, h, w = x.shape
    assert n6 % 6 == 0, f"batch {n6} not divisible by 6"
    nhwc = jnp.transpose(x.reshape(n6 // 6, 6, c, h, w), (0, 1, 3, 4, 2))
    out = cube_pad(nhwc, lrtd_pad)
    return jnp.transpose(out, (0, 1, 4, 2, 3)).reshape(n6, c, *out.shape[2:4])


@partial(jax.jit, static_argnames=("lrtd_pad",))
def zero_pad(x: jax.Array, lrtd_pad: Pads) -> jax.Array:
    """Zero-padding ablation baseline (config key ``cube_pad: false``).

    The reference's ZeroPad is commented out yet still referenced
    (model/cube_pad.py:219-254 vs model/resnet_cubic.py:73) — we ship a
    working one.  Same signature as :func:`cube_pad`.
    """
    p_l, p_r, p_t, p_d = get_pad_size(lrtd_pad)
    pad_cfg = [(0, 0)] * (x.ndim - 3) + [(p_t, p_d), (p_l, p_r), (0, 0)]
    return jnp.pad(x, pad_cfg)


def cube_pad_explicit(x: jax.Array, lrtd_pad: Pads) -> jax.Array:
    """Slice/flip/concat implementation — in-repo oracle for the gather map.

    Follows the same plate construction as the index-map builder but on the
    data itself (the shape the reference computes tensor-by-tensor,
    model/cube_pad.py:95-216).  Used by tests to cross-check
    :func:`cube_pad`; prefer :func:`cube_pad` everywhere else.
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    p_l, p_r, p_t, p_d = get_pad_size(lrtd_pad)
    top, down, lcol, rcol = _plates_and_cols_jnp(x, p_l, p_r, p_t, p_d)

    mid = x
    if p_t:
        mid = jnp.concatenate([top, mid], axis=2)
    if p_d:
        mid = jnp.concatenate([mid, down], axis=2)
    cols = []
    if p_l:
        cols.append(lcol)
    cols.append(mid)
    if p_r:
        cols.append(rcol)
    out = jnp.concatenate(cols, axis=3)
    return out[0] if squeeze else out


def _plates_and_cols_jnp(x, p_l, p_r, p_t, p_d):
    """Neighbour plates on the data itself, assembly-form-agnostic.

    Returns (top, down, lcol, rcol): top/down are [N,6,p,W,C] plates for the
    middle column; lcol/rcol are FULL padded-height [N,6,H+pt+pd,p,C]
    columns with their corner blocks attached (reference
    model/cube_pad.py:165-216).  Entries are None where the pad is 0.
    """
    # [N,6,H,W,C] -> per-face [N,H,W,C] views, build plates with jnp.
    faces = [x[:, i] for i in range(6)]
    b, d, f, l, r, t = faces  # noqa: E741

    def tr(a):  # transpose H<->W
        return jnp.swapaxes(a, 1, 2)

    top = down = left = right = None
    if p_t:
        top = jnp.stack(
            [
                t[:, :p_t, :][:, :, ::-1],
                f[:, -p_t:, :],
                t[:, -p_t:, :],
                tr(t[:, :, :p_t]),
                tr(t[:, :, -p_t:])[:, :, ::-1],
                b[:, :p_t, :][:, :, ::-1],
            ],
            axis=1,
        )
    if p_d:
        down = jnp.stack(
            [
                d[:, -p_d:, :][:, :, ::-1],
                b[:, -p_d:, :][:, :, ::-1],
                d[:, :p_d, :],
                tr(d[:, :, :p_d])[:, :, ::-1],
                tr(d[:, :, -p_d:]),
                f[:, :p_d, :],
            ],
            axis=1,
        )
    if p_l:
        left = jnp.stack(
            [
                r[:, :, -p_l:],
                tr(l[:, -p_l:, :])[:, ::-1, :],
                l[:, :, -p_l:],
                b[:, :, -p_l:],
                f[:, :, -p_l:],
                tr(l[:, :p_l, :]),
            ],
            axis=1,
        )
    if p_r:
        right = jnp.stack(
            [
                l[:, :, :p_r],
                tr(r[:, -p_r:, :]),
                r[:, :, :p_r],
                f[:, :, :p_r],
                b[:, :, :p_r],
                tr(r[:, :p_r, :])[:, ::-1, :],
            ],
            axis=1,
        )

    def corner(feat_td, feat_lr):
        td_pad = feat_td.shape[2]
        lr_pad = feat_lr.shape[3]
        if td_pad > lr_pad:
            return jnp.tile(feat_lr, (1, 1, td_pad, 1, 1))
        return jnp.tile(feat_td, (1, 1, 1, lr_pad, 1))

    p_tr = corner(top[:, :, -p_t:, -1:], right[:, :, :1, :p_r]) if (p_t and p_r) else None
    p_tl = corner(top[:, :, :p_t, :1], left[:, :, :1, :p_l]) if (p_t and p_l) else None
    p_dr = corner(down[:, :, -p_d:, -1:], right[:, :, -1:, -p_r:]) if (p_d and p_r) else None
    p_dl = corner(down[:, :, :p_d, :1], left[:, :, -1:, -p_l:]) if (p_d and p_l) else None

    lcol = rcol = None
    if p_l:
        lcol = left
        if p_tl is not None:
            lcol = jnp.concatenate([p_tl, lcol], axis=2)
        if p_dl is not None:
            lcol = jnp.concatenate([lcol, p_dl], axis=2)
    if p_r:
        rcol = right
        if p_tr is not None:
            rcol = jnp.concatenate([p_tr, rcol], axis=2)
        if p_dr is not None:
            rcol = jnp.concatenate([rcol, p_dr], axis=2)
    return top, down, lcol, rcol


@partial(jax.jit, static_argnames=("lrtd_pad",))
def cube_pad_dus(x: jax.Array, lrtd_pad: Pads) -> jax.Array:
    """Cube padding assembled by strip WRITES instead of concats.

    Same values as :func:`cube_pad` / :func:`cube_pad_explicit` (one shared
    plate construction, cross-checked in tests/test_cube_pad.py).  The
    explicit form's final width-axis concat of 1-to-3-px columns rewrites
    the entire tensor across the (sublane, lane) tiling; this form instead
    zero-pads once (one aligned copy) and overwrites only the edge strips
    with ``dynamic_update_slice``, so the halo bytes — not the whole
    feature map — are the cost.  Kept separate while the two forms are
    A/B-benched on real hardware (tools/bench_cubepad_forms.py).
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    assert x.shape[1] == 6, f"expected a 6-face axis, got {x.shape[1]}"
    if x.shape[2] != x.shape[3]:
        raise ValueError(
            f"cube padding requires square faces, got {x.shape[2]}x{x.shape[3]}"
        )
    p_l, p_r, p_t, p_d = get_pad_size(lrtd_pad)
    if (p_l, p_r, p_t, p_d) == (0, 0, 0, 0):
        return x[0] if squeeze else x
    h, w = x.shape[2], x.shape[3]
    top, down, lcol, rcol = _plates_and_cols_jnp(x, p_l, p_r, p_t, p_d)
    out = jnp.pad(x, [(0, 0), (0, 0), (p_t, p_d), (p_l, p_r), (0, 0)])
    if top is not None:
        out = out.at[:, :, :p_t, p_l:p_l + w, :].set(top)
    if down is not None:
        out = out.at[:, :, p_t + h:, p_l:p_l + w, :].set(down)
    if lcol is not None:
        out = out.at[:, :, :, :p_l, :].set(lcol)
    if rcol is not None:
        out = out.at[:, :, :, p_l + w:, :].set(rcol)
    return out[0] if squeeze else out


def _pool_halo_strips_slice(x):
    """Pool halo strips via the explicit plate construction (no gather).

    x: [N, 6, H, W, C] -> (halo_t [N,6,W+1,C], halo_l [N,6,H+1,C]): the
    padded row 0 over cols 0..W (corner_tl + top plate) and padded col 0
    over rows 0..H (corner_tl + left plate) — exactly the
    ``m[:, 0, :w+1]`` / ``m[:, :h+1, 0]`` index-map entries.
    """
    top, _, lcol, _ = _plates_and_cols_jnp(x, 1, 0, 1, 0)
    halo_t = jnp.concatenate([lcol[:, :, 0], top[:, :, 0]], axis=2)
    return halo_t, lcol[:, :, :, 0]


def _conv_halo_strips_slice(x, with_bottom_right):
    """Conv halo strips via the explicit plate construction (no gather).

    Returns (halo_t, halo_l, halo_b, halo_r): full padded rows 0 / H+1
    (length W+2, corners in) and padded cols 0 / W+1 without corner rows
    (length H); halo_b/halo_r are None when with_bottom_right is False.
    """
    h = x.shape[2]
    p_d = 1 if with_bottom_right else 0
    top, down, lcol, rcol = _plates_and_cols_jnp(x, 1, 1, 1, p_d)
    halo_t = jnp.concatenate(
        [lcol[:, :, 0], top[:, :, 0], rcol[:, :, 0]], axis=2)
    halo_l = lcol[:, :, 1:1 + h, 0]
    halo_r = rcol[:, :, 1:1 + h, 0]
    halo_b = None
    if with_bottom_right:
        halo_b = jnp.concatenate(
            [lcol[:, :, -1], down[:, :, 0], rcol[:, :, -1]], axis=2)
    return halo_t, halo_l, halo_b, halo_r


@partial(jax.jit, static_argnames=("form",))
def cube_pad_max_pool_3x3s2(x: jax.Array, form: str = None) -> jax.Array:
    """EXACT ``max_pool(cube_pad(x, 1), 3, stride 2)`` without ever
    materializing the padded tensor — the ResNet stem-pool fusion.

    Pool-window arithmetic (even H): output window i covers padded rows
    [2i, 2i+2] for i < H/2, so padded row H+1 and column W+1 — the whole
    BOTTOM/RIGHT halo — are dead, and the TOP/LEFT halo reaches only
    output row 0 / column 0.  The interior therefore pools from a
    top/left -inf pad of the unpadded faces (one aligned copy instead of
    the full strip assembly + 114x114 rewrite), and output row 0 / col 0
    take a max with the 3-wide/stride-2 windowed top/left halo strips,
    gathered directly off the index map (a [6*(H+1+W+1), C] take — halo
    bytes only).  Exact by construction: max is insensitive to how the
    window's cells are grouped (measured r5: the materialized pad+pool
    phase was 7.67 ms of the 22 ms stage-1 backbone batch — the single
    largest cube-padding cost, tools/profile_backbone.py).

    x: [N, 6, H, W, C] (H = W, even) -> [N, 6, H/2, W/2, C].
    Replaces the reference's CubePadding(1) + nn.MaxPool2d(3, 2)
    (model/resnet_cubic.py:118-119,166-167).

    ``form``: interior-pool execution form — 'fused2d' (one 2-D
    overlapping reduce_window), 'separable' (3x1 rows then 1x3 cols;
    exact, since max over a 3x3 window is the max of row maxes),
    'fused2d_dus' (same interior pool, but the row-0/col-0 edge
    corrections land via dynamic_update_slice instead of whole-tensor
    concats), or 'pairmax' (no reduce_window at all: per axis, the
    3-wide stride-2 window max is the max of TWO contiguous pair-maxes —
    ``max3[i] = max(max(y[2i],y[2i+1]), max(y[2i+1],y[2i+2]))`` — each a
    plain reshape-reduce on an offset slice; exact, zero overlapping
    windows, zero strided slices).  Default None resolves
    CP360_POOL_FORM, falling back to 'fused2d_dus'.
    """
    if form is None:
        form = POOL_FORM or "fused2d_dus"
    if form not in ("fused2d", "fused2d_dus", "separable", "pairmax"):
        raise ValueError(f"unknown pool form {form!r}")
    n, six, h, w, c = x.shape
    assert six == 6 and h == w and h % 2 == 0, (n, six, h, w, c)
    if (HALO_SOURCE or "slice") == "slice":
        halo_t, halo_l = _pool_halo_strips_slice(x)
    else:
        m = build_cube_pad_index_map(h, w, 1)  # [6,h+2,w+2] into flat [6hw]
        ring_t = jnp.asarray(m[:, 0, : w + 1].reshape(-1))   # top halo row
        ring_l = jnp.asarray(m[:, : h + 1, 0].reshape(-1))   # left halo col
        flat = x.reshape(n, six * h * w, c)
        halo_t = jnp.take(flat, ring_t, axis=1).reshape(n, six, w + 1, c)
        halo_l = jnp.take(flat, ring_l, axis=1).reshape(n, six, h + 1, c)

    if jnp.issubdtype(x.dtype, jnp.floating):
        neg = jnp.asarray(-jnp.inf, x.dtype)
    else:
        neg = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    xp = jnp.pad(x.reshape(n * six, h, w, c),
                 [(0, 0), (1, 0), (1, 0), (0, 0)], constant_values=neg)
    if form == "separable":
        rows = jax.lax.reduce_window(
            xp, neg, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1), "VALID")
        pooled = jax.lax.reduce_window(
            rows, neg, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1), "VALID"
        ).reshape(n, six, h // 2, w // 2, c)
    elif form == "pairmax":
        def axis3s2(y, axis):
            ln = (y.shape[axis] - 1) // 2
            s0 = jax.lax.slice_in_dim(y, 0, 2 * ln, axis=axis)
            s1 = jax.lax.slice_in_dim(y, 1, 2 * ln + 1, axis=axis)

            def pm(z):
                shp = list(z.shape)
                shp[axis] = ln
                shp.insert(axis + 1, 2)
                return jnp.max(z.reshape(shp), axis=axis + 1)

            return jnp.maximum(pm(s0), pm(s1))

        pooled = axis3s2(axis3s2(xp, 1), 2).reshape(
            n, six, h // 2, w // 2, c)
    else:
        pooled = jax.lax.reduce_window(
            xp, neg, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        ).reshape(n, six, h // 2, w // 2, c)

    def win3(s):
        # [-, L, C] (L odd) -> stride-2 max over 3-wide windows, (L-1)/2 out
        return jnp.maximum(jnp.maximum(s[:, :, 0:-2:2], s[:, :, 1:-1:2]),
                           s[:, :, 2::2])

    row0 = jnp.maximum(pooled[:, :, 0], win3(halo_t))          # [n,6,w/2,c]
    if form in ("fused2d_dus", "pairmax"):
        # dus assembly: measured 5.21 vs 5.55 ms (concat rewrites the whole
        # pooled tensor twice; POOL_FORMS_r05.json)
        pooled = pooled.at[:, :, 0].set(row0)
        col0 = jnp.maximum(pooled[:, :, :, 0], win3(halo_l))   # [n,6,h/2,c]
        return pooled.at[:, :, :, 0].set(col0)
    pooled = jnp.concatenate([row0[:, :, None], pooled[:, :, 1:]], axis=2)
    col0 = jnp.maximum(pooled[:, :, :, 0], win3(halo_l))       # [n,6,h/2,c]
    return jnp.concatenate([col0[:, :, :, None], pooled[:, :, :, 1:]], axis=3)


def cube_pad_conv3x3(x: jax.Array, w: jax.Array, stride: int = 1,
                     compute_dtype=None, form: str = None) -> jax.Array:
    """``conv2d(cube_pad(x, 1), w, stride, VALID)`` — the Bottleneck 3x3
    hot path (reference model/resnet_cubic.py:92-93: CubePad(1) before every
    Bottleneck 3x3) — optionally WITHOUT materializing the padded tensor.

    form='pad' (semantic baseline): cube_pad then a VALID conv.

    form='halo': one zero-padding conv over the raw faces — interior
    outputs are exact because the padding taps contribute 0 — plus thin
    correction convs over the halo strips gathered straight off the index
    map, added onto the border ring:

      out[0, j]   += sum_b w[0, b] * halo_top[j*s + b]      (1x3, corners in)
      out[-1, j]  += sum_b w[2, b] * halo_bot[j + b]        (stride 1 only)
      out[i, 0]   += sum_a w[a, 0] * halo_left[i*s + a - 1] (3x1, zero-ended)
      out[i, -1]  += sum_a w[a, 2] * halo_right[i + a - 1]  (stride 1 only)

    Corner bookkeeping: the top/bottom strips carry their corner pixels
    (so out[0,0] gets w[0,0]*xpad[-1,-1] exactly once) and the left/right
    strips exclude them (their 3x1 convs are zero-padded at the ends).  At
    stride 2 on even H the bottom/right halos are DEAD (output row i covers
    padded rows [2i, 2i+2], so padded row H+1 / col W+1 are never read) —
    the same window arithmetic the fused pool exploits.

    Numerics: 'halo' reassociates the border ring's 9-tap sum (main conv
    rounds before the correction adds), so it matches 'pad' to f32
    reassociation error (~1e-6 rel) / one output-dtype ulp in bf16 — NOT
    bit-exact.  The f32 parity paths keep 'pad'.

    x: [N, 6, H, W, C] (H = W); w: [3, 3, C, Co].
    Returns [N, 6, H', W', Co] with H' = H/stride.
    """
    from cp360_tpu.models import layers

    if form is None:
        form = CUBE_CONV_FORM or "pad"
    if form not in ("pad", "halo"):
        raise ValueError(f"unknown cube-conv form {form!r}")
    n, six, h, wd, c = x.shape
    assert six == 6 and h == wd and w.shape[:2] == (3, 3), (x.shape, w.shape)
    assert stride in (1, 2) and (stride == 1 or h % 2 == 0), (stride, h)

    if form == "pad":
        xp = cube_pad(x, 1).reshape(n * 6, h + 2, wd + 2, c)
        out = layers.conv2d(xp, w, stride=stride, compute_dtype=compute_dtype)
        return out.reshape(n, 6, *out.shape[1:])

    xf = x.reshape(n * 6, h, wd, c)
    main = layers.conv2d(xf, w, stride=stride, padding=[(1, 1), (1, 1)],
                         compute_dtype=compute_dtype)

    if (HALO_SOURCE or "slice") == "slice":
        h_t, h_l, h_b, h_r = _conv_halo_strips_slice(x, stride == 1)
        halo_t = h_t.reshape(n * 6, 1, wd + 2, c)
        halo_l = h_l.reshape(n * 6, h, 1, c)
        if stride == 1:
            halo_b = h_b.reshape(n * 6, 1, wd + 2, c)
            halo_r = h_r.reshape(n * 6, h, 1, c)
    else:
        m = build_cube_pad_index_map(h, wd, 1)  # [6,h+2,w+2] into [6hw]
        flat = x.reshape(n, 6 * h * wd, c)
        # one gather for every strip this stride needs (halo bytes only);
        # strip lengths differ (w+2 vs h) so segments slice by offset
        segs = [m[:, 0, :],             # top row, with corners    [6, w+2]
                m[:, 1:h + 1, 0]]       # left col, no corners     [6, h]
        if stride == 1:
            segs += [m[:, h + 1, :],    # bottom row, with corners [6, w+2]
                     m[:, 1:h + 1, wd + 1]]  # right col           [6, h]
        lens = [s.shape[1] for s in segs]
        offs = np.concatenate([[0], np.cumsum(lens)])
        ring = jnp.asarray(np.concatenate(segs, axis=1).reshape(-1))
        total = int(offs[-1])
        halo = jnp.take(flat, ring, axis=1).reshape(n * 6, total, c)

        def seg(i):
            return halo[:, int(offs[i]):int(offs[i + 1]), :]

        halo_t = seg(0)[:, None]                       # [B, 1, w+2, c]
        halo_l = seg(1)[:, :, None]                    # [B, h, 1, c]
        if stride == 1:
            halo_b = seg(2)[:, None]
            halo_r = seg(3)[:, :, None]
    corr_t = layers.conv2d(halo_t, w[0:1], stride=(1, stride),
                           compute_dtype=compute_dtype)
    corr_l = layers.conv2d(halo_l, w[:, 0:1], stride=(stride, 1),
                           padding=[(1, 1), (0, 0)],
                           compute_dtype=compute_dtype)
    out = main.at[:, 0, :, :].add(corr_t[:, 0])
    out = out.at[:, :, 0, :].add(corr_l[:, :, 0])
    if stride == 1:
        corr_b = layers.conv2d(halo_b, w[2:3], compute_dtype=compute_dtype)
        corr_r = layers.conv2d(halo_r, w[:, 2:3],
                               padding=[(1, 1), (0, 0)],
                               compute_dtype=compute_dtype)
        out = out.at[:, -1, :, :].add(corr_b[:, 0])
        out = out.at[:, :, -1, :].add(corr_r[:, :, 0])
    return out.reshape(n, 6, *out.shape[1:])
