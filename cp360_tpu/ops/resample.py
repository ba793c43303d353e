"""Gather-based resampling ops (JAX, NHWC).

All projection resampling in the framework is expressed as *precomputed
float coordinate maps* (built once on the host, see cp360_tpu/geometry)
consumed by the bilinear gather kernels here.  Under jit the coordinate
arrays are constants, so XLA folds the floor/weight computation and each
resample compiles to 4 gathers + a weighted sum — no scatter, no masks in
the hot path, fully differentiable (gather transposes to scatter-add).

Semantics notes (parity with the reference):

- ``cube_to_equi`` reproduces the reference's differentiable GPU path
  (utils/cube_to_equi.py:37-66): torch-0.3 ``grid_sample`` with its implicit
  align_corners=True normalization — i.e. plain bilinear sampling at the
  precomputed [0, w-1] float coords.
- ``equi_to_cube`` reproduces ``cv2.remap(..., INTER_LINEAR)``
  (utils/equi_to_cube.py:112-129) up to cv2's 1/32-pixel fixed-point
  coordinate quantization.
- ``grid_sample`` / ``resize_bilinear`` reproduce torch-0.3
  ``nn.functional.grid_sample`` / ``upsample(mode='bilinear')`` — both
  align_corners=True in that era — used by the training losses
  (temporal_model/train_temporal.py:132-143).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.geometry import equi_cube


def _bilinear_gather(flat_src: jax.Array, xs: jax.Array, ys: jax.Array,
                     src_h: int, src_w: int, base: jax.Array | int = 0):
    """Bilinear sample ``flat_src`` [..., src_h*src_w(+), C] at float coords.

    xs/ys: float arrays of identical shape S (the output pixel grid).
    base: optional per-output-pixel offset added to the flat index (used to
      select a cube face).  Corner indices are clamped to the valid range;
      out-of-range corners keep their (zero or border) weight semantics of
      the callers, which pre-clamp coordinates.

    Returns [..., *S, C].  Integer sources are sampled in float32 and
    rounded back to the input dtype (cv2.remap-style), so uint8 frames get
    true bilinear weights instead of silently degrading to floor-pixel
    sampling via an integer-cast fractional weight.
    """
    src_dtype = flat_src.dtype
    integer_src = not jnp.issubdtype(src_dtype, jnp.inexact)
    if integer_src:
        flat_src = flat_src.astype(jnp.float32)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0).astype(flat_src.dtype)
    fy = (ys - y0).astype(flat_src.dtype)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, src_w - 1)
    y1 = jnp.clip(y0 + 1, 0, src_h - 1)
    x0 = jnp.clip(x0, 0, src_w - 1)
    y0 = jnp.clip(y0, 0, src_h - 1)

    i00 = base + y0 * src_w + x0
    i01 = base + y0 * src_w + x1
    i10 = base + y1 * src_w + x0
    i11 = base + y1 * src_w + x1

    def take(i):
        return jnp.take(flat_src, i.reshape(-1), axis=-2)

    s = xs.shape
    g00, g01, g10, g11 = take(i00), take(i01), take(i10), take(i11)
    w00 = ((1 - fx) * (1 - fy)).reshape(-1, 1)
    w01 = (fx * (1 - fy)).reshape(-1, 1)
    w10 = ((1 - fx) * fy).reshape(-1, 1)
    w11 = (fx * fy).reshape(-1, 1)
    out = g00 * w00 + g01 * w01 + g10 * w10 + g11 * w11
    if integer_src:
        out = jnp.round(out).astype(src_dtype)
    return out.reshape(*flat_src.shape[:-2], *s, flat_src.shape[-1])


@partial(jax.jit, static_argnames=("face_w",))
def equi_to_cube(equi: jax.Array, face_w: int) -> jax.Array:
    """Equirectangular image(s) -> 6 cube faces, NHWC.

    Args:
      equi: [H, 2H, C] or [N, H, 2H, C].
      face_w: output face resolution (e.g. 224).

    Returns [6, face_w, face_w, C] (or [N, 6, ...]) in B D F L R T order.

    NOTE: this exact all-device path is the semantic reference; on TPU the
    4-tap gather of 3-channel rows lowers poorly (~66 ms/frame on v5e), so
    the production extraction default samples faces on host
    (host_equi_to_cube_u8, config ``host_cube_remap: true``) and ships the
    0.9 MB faces instead of the 5.5 MB frame.
    """
    squeeze = equi.ndim == 3
    if squeeze:
        equi = equi[None]
    n, h, w, c = equi.shape
    in_x, in_y = equi_cube.build_equi2cube_maps(face_w, h, w)
    xs = jnp.asarray(in_x, dtype=jnp.float32)
    ys = jnp.asarray(in_y, dtype=jnp.float32)
    flat = equi.reshape(n, h * w, c)
    out = _bilinear_gather(flat, xs, ys, h, w)  # [N, 6, fw, fw, C]
    return out[0] if squeeze else out


from functools import lru_cache


@lru_cache(maxsize=8)
def build_cube2equi_matrix(face_w: int) -> np.ndarray:
    """Dense interpolation matrix M [2w*4w, 6*w*w], 4 nonzeros per row.

    Row p holds the bilinear corner weights of equi output pixel p against
    the flattened face pixels — the cube->equi resample becomes ONE matmul.
    Coincident corners (clamped coords) accumulate, matching the gather
    formulation exactly.
    """
    coords, face_map = equi_cube.build_cube2equi_map(face_w)
    w = face_w
    xs = coords[..., 0].reshape(-1)
    ys = coords[..., 1].reshape(-1)
    base = (face_map.reshape(-1) * (w * w)).astype(np.int64)

    x0 = np.floor(xs)
    y0 = np.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0 = x0.astype(np.int64)
    y0 = y0.astype(np.int64)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, w - 1)
    x0 = np.clip(x0, 0, w - 1)
    y0 = np.clip(y0, 0, w - 1)

    n_out = xs.size
    m = np.zeros((n_out, 6 * w * w), np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, base + y0 * w + x0), (1 - fx) * (1 - fy))
    np.add.at(m, (rows, base + y0 * w + x1), fx * (1 - fy))
    np.add.at(m, (rows, base + y1 * w + x0), (1 - fx) * fy)
    np.add.at(m, (rows, base + y1 * w + x1), fx * fy)
    return m


@partial(jax.jit, static_argnames=())
def cube_to_equi(faces: jax.Array) -> jax.Array:
    """6 cube faces -> equirectangular, NHWC.

    Args:
      faces: [6, w, w, C] or [N, 6, w, w, C] in B D F L R T order.

    Returns [2w, 4w, C] (or [N, 2w, 4w, C]).

    Matches the reference's differentiable path (utils/cube_to_equi.py:37-66):
    bilinear at precomputed in-face coords, face chosen by the precomputed
    face map.  Differentiable — it sits on the training gradient path.

    For small faces (the CAM-cube sizes) this runs as one dense
    interpolation-matrix matmul on the MXU — measured ~40x faster on v5e
    than the 4-corner gather, which XLA lowers poorly; large faces fall
    back to the gather.
    """
    squeeze = faces.ndim == 4
    if squeeze:
        faces = faces[None]
    n, six, h, w, c = faces.shape
    assert six == 6 and h == w, f"expected [N,6,w,w,C], got {faces.shape}"
    flat = faces.reshape(n, 6 * h * w, c)

    # Matmul form: M is [8w^2, 6w^2] f32 = 192*w^4 bytes (w=14 -> 7 MB, the
    # shipped CAM sizes; w=20 -> 30 MB).  Cap where the dense matrix stays
    # cheap to build/ship/cache — beyond that the gather path, though slower
    # per element, avoids multi-hundred-MB jit constants (w=52 would be
    # 1.4 GB, lru-cached 8 deep).
    if 6 * h * w <= 6 * 20 * 20:
        # Default f32 matmul precision: "highest" is pathologically slow on
        # this libtpu (measured 16.6 s vs 5.7 ms for this op) and the default
        # is already ~1e-6-accurate for these 4-term weighted sums.
        m = jnp.asarray(build_cube2equi_matrix(w))
        out = jnp.einsum(
            "pq,nqc->npc", m, flat.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(faces.dtype)
        out = out.reshape(n, 2 * w, 4 * w, c)
        return out[0] if squeeze else out

    coords, face_map = equi_cube.build_cube2equi_map(w)
    xs = jnp.asarray(coords[..., 0], dtype=jnp.float32)
    ys = jnp.asarray(coords[..., 1], dtype=jnp.float32)
    base = jnp.asarray(face_map * (h * w), dtype=jnp.int32)
    out = _bilinear_gather(flat, xs, ys, h, w, base=base)  # [N, 2w, 4w, C]
    return out[0] if squeeze else out


def grid_sample(x: jax.Array, grid: jax.Array) -> jax.Array:
    """torch-0.3 ``nn.functional.grid_sample`` semantics, NHWC.

    Args:
      x: [N, H, W, C].
      grid: [N, Hg, Wg, 2] with (x, y) in [-1, 1]; align_corners=True
        normalization (the only behaviour torch 0.3 had); out-of-range
        samples contribute zeros (zero padding_mode).

    Used by flow warping in the training losses
    (temporal_model/train_temporal.py:143) and as the general sampler.
    """
    src_dtype = x.dtype
    if not jnp.issubdtype(src_dtype, jnp.inexact):
        # Integer inputs would truncate the fractional weights to 0 below;
        # sample in float32 and round back (cv2/torch-style).
        x = x.astype(jnp.float32)
    n, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = (gx - x0).astype(x.dtype)
    fy = (gy - y0).astype(x.dtype)

    def corner(yi, xi, wgt):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yc * w + xc  # [N, Hg, Wg]
        flat = x.reshape(n, h * w, c)
        vals = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1).astype(jnp.int32), axis=1
        ).reshape(n, *idx.shape[1:], c)
        return vals * (wgt * inb.astype(x.dtype))[..., None]

    out = (
        corner(y0, x0, (1 - fx) * (1 - fy))
        + corner(y0, x0 + 1, fx * (1 - fy))
        + corner(y0 + 1, x0, (1 - fx) * fy)
        + corner(y0 + 1, x0 + 1, fx * fy)
    )
    if not jnp.issubdtype(src_dtype, jnp.inexact):
        out = jnp.round(out).astype(src_dtype)
    return out


def warp_upsampled(p_lo: jax.Array, grid: jax.Array) -> jax.Array:
    """``grid_sample(resize_bilinear(p_lo[..., None], H, W), grid)[..., 0]``
    evaluated WITHOUT the upsample or the gather.

    The training smooth loss warps an align-corners bilinear upsample of the
    tiny prediction map by the flow grid (train_temporal.py:132-143).  A
    22M-point 4-corner gather is pathological on TPU (~230 ms/step measured,
    65% of the whole optimization step), but the sampled image is
    ``U = Ry @ p @ Rx^T`` and the resize matrices are analytic hats
    (``Ry[r, a] = max(0, 1 - |r*s - a|)``, s = (ph-1)/(H-1)), so the sample
    at continuous position (gy, gx) collapses to a bilinear form with the
    low-res map itself:

        warp[pix] = d[pix, :] @ p @ e[pix, :]^T
        d[pix, a] = (1-fy) Ry[y0, a] + fy Ry[y0+1, a]   (evaluated, not read)
        e[pix, b] = (1-fx) Rx[x0, b] + fx Rx[x0+1, b]

    Pure VPU arithmetic + one [HW, pw] x [pw, ph] matmul per image — no
    gather, no [HW, H]-sized one-hot operands.  Exact same zero-padding
    semantics as :func:`grid_sample` (out-of-range fine rows/cols masked).

    Layout note: the weight/product axis (ph/pw, 14/28 at the shipped
    operating point) leads and the pixel grid stays trailing — putting a
    14-wide axis in the 128-lane position pads 9x and measured 8x slower.

    Args:
      p_lo: [N, ph, pw] low-res maps.
      grid: [N, H, W, 2] in [-1, 1], align-corners (as for grid_sample).

    Returns [N, H, W].
    """
    n, ph, pw = p_lo.shape
    out_h, out_w = grid.shape[1], grid.shape[2]
    gx = (grid[..., 0] + 1.0) * 0.5 * (out_w - 1)  # [N, H, W]
    gy = (grid[..., 1] + 1.0) * 0.5 * (out_h - 1)

    def axis_weights(g, n_fine, n_coarse):
        scale = (n_coarse - 1.0) / (n_fine - 1.0)
        ar = jnp.arange(n_coarse, dtype=g.dtype)[None, :, None, None]
        g0 = jnp.floor(g)
        f = g - g0

        def row_of_resize_matrix(yi):
            inb = (yi >= 0) & (yi <= n_fine - 1)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(yi[:, None] * scale - ar))
            return w * inb[:, None].astype(g.dtype)

        return ((1.0 - f)[:, None] * row_of_resize_matrix(g0)
                + f[:, None] * row_of_resize_matrix(g0 + 1.0))

    d = axis_weights(gy, out_h, ph)  # [N, ph, H, W]
    e = axis_weights(gx, out_w, pw)  # [N, pw, H, W]
    b = jnp.einsum("nbhw,nab->nahw", e, p_lo,
                   preferred_element_type=jnp.float32)
    return jnp.sum(d * b, axis=1)


@lru_cache(maxsize=32)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """1-D align-corners bilinear interpolation matrix [n_out, n_in]."""
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    i0 = np.floor(pos).astype(np.int64)
    f = pos - i0
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), 1.0 - f)
    np.add.at(m, (rows, i1), f)
    return m


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch-0.3 ``upsample(mode='bilinear')`` (align_corners=True), NHWC.

    Args:
      x: [N, H, W, C] -> [N, out_h, out_w, C].

    The training losses upsample 14x28 predictions to flow resolution with
    this op (temporal_model/train_temporal.py:132-135).  Bilinear resize is
    separable, so it runs as two dense interpolation matmuls (MXU) rather
    than a gather — same exact weights.
    """
    n, h, w, c = x.shape
    ry = jnp.asarray(_resize_matrix(h, out_h))  # [out_h, h]
    rx = jnp.asarray(_resize_matrix(w, out_w))  # [out_w, w]
    xf = x.astype(jnp.float32)
    out = jnp.einsum("Oh,nhwc->nOwc", ry, xf, preferred_element_type=jnp.float32)
    out = jnp.einsum("Pw,nhwc->nhPc", rx, out, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def remap_bilinear_numpy(img: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Host/NumPy bilinear remap — oracle & host-pipeline fallback.

    img: [H, W] or [H, W, C]; xs/ys: float maps of the output grid.
    Border: clamped (the geometry maps pre-clamp coords to the interior,
    matching cv2.remap's effective behaviour for these maps).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(x0, 0, w - 1)
    y0 = np.clip(y0, 0, h - 1)
    out = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )
    return out[..., 0] if squeeze else out
