"""Resampling ops: goldens vs reference naive oracle, cv2.remap, and torch."""

import os

import numpy as np
import jax.numpy as jnp

from cp360_tpu.ops.resample import (
    cube_to_equi,
    equi_to_cube,
    grid_sample,
    remap_bilinear_numpy,
    resize_bilinear,
)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "geometry.npz"))


def test_cube_to_equi_matches_reference_naive():
    faces = GOLDEN["naive_in"]  # [6, 16, 16, 5]
    want = GOLDEN["naive_out"]  # [32, 64, 5]
    got = np.asarray(cube_to_equi(jnp.asarray(faces)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cube_to_equi_batched():
    faces = np.stack([GOLDEN["naive_in"], GOLDEN["naive_in"] * 2.0])
    got = np.asarray(cube_to_equi(jnp.asarray(faces)))
    assert got.shape == (2, 32, 64, 5)
    np.testing.assert_allclose(got[1], 2.0 * got[0], rtol=1e-6)


def test_equi_to_cube_matches_cv2_remap():
    img = GOLDEN["remap_in"]  # [128, 256, 3]
    want = GOLDEN["remap_out"]  # [6, 32, 32, 3]
    got = np.asarray(equi_to_cube(jnp.asarray(img), 32))
    # cv2.remap quantizes coordinate fractions to 1/32 px — tolerance covers it.
    np.testing.assert_allclose(got, want, atol=2e-2)
    assert np.abs(got - want).mean() < 2e-3


def test_equi_to_cube_matches_numpy_remap_exactly():
    from cp360_tpu.geometry import build_equi2cube_maps

    img = GOLDEN["remap_in"]
    in_x, in_y = build_equi2cube_maps(32, 128, 256)
    want = np.stack([remap_bilinear_numpy(img, in_x[i], in_y[i]) for i in range(6)])
    got = np.asarray(equi_to_cube(jnp.asarray(img), 32))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)  # NHWC
    grid = (rng.rand(2, 4, 6, 2).astype(np.float32) * 2.4 - 1.2)  # some OOB

    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    want = (
        F.grid_sample(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_bilinear_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 14, 28, 1).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 480, 960))
    want = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=(480, 960),
            mode="bilinear",
            align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_equi_cube_roundtrip_psnr():
    # Project a smooth equi image to the cube and back: should reconstruct
    # well away from poles (a sanity bound, not bit parity).
    h, w = 64, 128
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.float32)[..., None]
    cube = equi_to_cube(jnp.asarray(img), 32)
    back = np.asarray(cube_to_equi(cube))  # [64, 128, 1]
    mid = slice(8, 56)  # skip pole rows
    err = np.mean((back[mid] - img[mid]) ** 2)
    psnr = 10 * np.log10(4.0 / err)  # signal range ~[-1,1]
    # ~23.6 dB at 32px faces: bounded below by the reference's intentional
    # +1-pixel equi2cube offset (see build_equi2cube_maps), kept for parity.
    assert psnr > 20, psnr


def test_warp_upsampled_equals_gather_composition():
    """warp_upsampled == grid_sample(resize_bilinear(p), grid) exactly (the
    gather-free training warp; grids include out-of-range samples to pin the
    zero-padding semantics)."""
    import jax.numpy as jnp

    from cp360_tpu.ops.resample import grid_sample, resize_bilinear, warp_upsampled

    rng = np.random.RandomState(7)
    p_lo = jnp.asarray(rng.rand(3, 14, 28).astype(np.float32))
    grid = jnp.asarray((rng.rand(3, 96, 192, 2) * 2.4 - 1.2).astype(np.float32))
    want = grid_sample(resize_bilinear(p_lo[..., None], 96, 192), grid)[..., 0]
    got = warp_upsampled(p_lo, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_warp_upsampled_integer_grid_is_identity():
    """Zero flow (the identity grid) reproduces the upsampled map."""
    import jax.numpy as jnp

    from cp360_tpu.ops.resample import resize_bilinear, warp_upsampled

    rng = np.random.RandomState(8)
    p_lo = jnp.asarray(rng.rand(2, 7, 9).astype(np.float32))
    h, w = 40, 80
    ys = np.linspace(-1, 1, h, dtype=np.float32)
    xs = np.linspace(-1, 1, w, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    grid = jnp.asarray(np.broadcast_to(np.stack([gx, gy], -1), (2, h, w, 2)))
    want = resize_bilinear(p_lo[..., None], h, w)[..., 0]
    got = warp_upsampled(p_lo, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
