"""NFoV visualizer (working replacement for the reference's broken tool)."""

import numpy as np

from cp360_tpu.imaging.fov import draw_fov_box, fov_boundary_mask, nfov_render


def _equi_gradient(h=128, w=256):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx / w, yy / h, 0.5 * np.ones_like(xx, float)], -1)
    return (img * 255).astype(np.float32)


def test_nfov_center_looks_forward():
    img = _equi_gradient()
    crop = nfov_render(img, yaw=0.0, pitch=0.0, out_h=64, out_w=64)
    assert crop.shape == (64, 64, 3)
    # center of the forward view samples the equi center column (theta=0 ->
    # x = w/2), where the red gradient is ~0.5
    assert abs(crop[32, 32, 0] / 255.0 - 0.5) < 0.02
    # vertical gradient preserved top-to-bottom
    assert crop[0, 32, 1] < crop[-1, 32, 1]


def test_nfov_yaw_shifts_view():
    img = _equi_gradient()
    right = nfov_render(img, yaw=np.pi / 2, pitch=0.0, out_h=32, out_w=32)
    # yaw +pi/2 looks at theta=pi/2 -> x = 3w/4 -> red ~0.75
    assert abs(right[16, 16, 0] / 255.0 - 0.75) < 0.02


def test_fov_boundary_mask_nonempty_and_local():
    mask = fov_boundary_mask(0.3, 0.1, 65.5, 128, 256)
    assert mask.any()
    assert mask.mean() < 0.2  # a thin outline, not a filled region


def test_draw_fov_box_marks_pixels():
    img = _equi_gradient()
    out = draw_fov_box(img, yaw=0.0, pitch=0.0)
    assert out.shape == img.shape
    assert (out != img).any()
    np.testing.assert_array_equal(img, _equi_gradient())  # input untouched
