"""Optical flow: host wrapper postprocessing + TPU-native Horn-Schunck."""

import numpy as np
import pytest
import jax.numpy as jnp

from cp360_tpu.flow.optical_flow import (
    _postprocess_magnitude,
    calc_optical_flow,
    horn_schunck_flow,
)


def _textured(h, w, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(h // 8, w // 8)
    img = np.kron(img, np.ones((8, 8)))  # blocky texture, smooth-ish
    yy, xx = np.mgrid[0:h, 0:w]
    return (img + 0.3 * np.sin(xx / 5.0) * np.cos(yy / 7.0)).astype(np.float32)


def test_postprocess_magnitude_matches_reference_rule():
    # reference utils/optical_flow.py:34-38: minmax-normalized magnitude with
    # values below mean-1.5*std zeroed.
    rng = np.random.RandomState(0)
    flow = rng.randn(16, 16, 2).astype(np.float32)
    got = _postprocess_magnitude(flow.copy())
    mag = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    mag = (mag - mag.min()) / (mag.max() - mag.min())
    mag[mag < mag.mean() - 1.5 * mag.std()] = 0
    np.testing.assert_allclose(got, mag, atol=1e-6)
    assert got.min() >= 0 and got.max() <= 1


def test_calc_optical_flow_recovers_translation():
    cv2 = pytest.importorskip("cv2")
    img = (_textured(120, 240, 1) * 255).clip(0, 255).astype(np.uint8)
    img3 = np.stack([img] * 3, -1)
    shifted = np.roll(img3, 4, axis=1)
    absflow, flow = calc_optical_flow(img3, shifted, res=(240, 120))
    assert flow.shape == (120, 240, 2)
    # median dx in the interior should be ~ +4 px
    dx = np.median(flow[20:-20, 20:-20, 0])
    assert 2.5 < dx < 5.5, dx
    assert absflow.shape == (120, 240)


def test_horn_schunck_recovers_translation():
    a = _textured(64, 64, 2)
    b = np.roll(a, 2, axis=1)  # shift right by 2 -> dx ~ +2
    flow = np.asarray(horn_schunck_flow(jnp.asarray(a), jnp.asarray(b), levels=3, iters=80))
    dx = np.median(flow[10:-10, 10:-10, 0])
    dy = np.median(flow[10:-10, 10:-10, 1])
    assert 1.0 < dx < 3.0, dx
    assert abs(dy) < 1.0, dy


def test_variational_flow_backend_wrapper():
    from cp360_tpu.flow.optical_flow import get_flow_fn
    from cp360_tpu.flow.variational import calc_optical_flow_variational

    img = (_textured(64, 128, 4) * 255).clip(0, 255).astype(np.uint8)
    img3 = np.stack([img] * 3, -1)
    shifted = np.roll(img3, 3, axis=1)
    absflow, flow = calc_optical_flow_variational(img3, shifted, res=(128, 64))
    assert flow.shape == (64, 128, 2) and absflow.shape == (64, 128)
    dx = np.median(flow[10:-10, 10:-10, 0])
    assert 2.0 < dx < 4.0, dx
    assert get_flow_fn("variational") is calc_optical_flow_variational


def test_device_flow_backend_wrapper():
    import jax.numpy as jnp  # noqa: F401
    from cp360_tpu.flow.optical_flow import calc_optical_flow_device, get_flow_fn

    img = (_textured(64, 128, 3) * 255).clip(0, 255).astype(np.uint8)
    img3 = np.stack([img] * 3, -1)
    shifted = np.roll(img3, 3, axis=1)
    absflow, flow = calc_optical_flow_device(img3, shifted, res=(128, 64))
    assert flow.shape == (64, 128, 2) and absflow.shape == (64, 128)
    dx = np.median(flow[10:-10, 10:-10, 0])
    assert 1.5 < dx < 4.5, dx
    assert get_flow_fn("horn_schunck") is calc_optical_flow_device
    import pytest as _pt

    with _pt.raises(ValueError):
        get_flow_fn("nope")
