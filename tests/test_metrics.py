"""Metric parity vs the reference eval functions (same seeded RNG stream)."""

import os

import numpy as np
import pytest

from cp360_tpu.metrics.saliency import (
    _resize_bilinear_np,
    auc_borji,
    auc_judd,
    corr_coeff,
    resize_eval,
    similarity,
)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "metrics.npz"))


@pytest.mark.parametrize("i", [0, 1, 2])
def test_auc_judd_parity(i):
    np.random.seed(123 + i)
    got = auc_judd(GOLDEN[f"sal{i}"].copy(), GOLDEN[f"gt{i}"].copy())
    assert got == pytest.approx(float(GOLDEN[f"auc_judd{i}"]), abs=1e-10)


@pytest.mark.parametrize("i", [0, 1, 2])
def test_auc_borji_parity(i):
    np.random.seed(123 + i)
    got = auc_borji(GOLDEN[f"sal{i}"].copy(), GOLDEN[f"gt{i}"].copy())
    assert got == pytest.approx(float(GOLDEN[f"auc_borji{i}"]), abs=1e-10)


@pytest.mark.parametrize("i", [0, 1, 2])
def test_cc_sim_parity(i):
    sal, gt = GOLDEN[f"sal{i}"].copy(), GOLDEN[f"gt{i}"].copy()
    assert corr_coeff(sal, gt) == pytest.approx(float(GOLDEN[f"cc{i}"]), abs=1e-6)
    assert similarity(sal, gt) == pytest.approx(float(GOLDEN[f"sim{i}"]), abs=1e-6)


def test_perfect_prediction_scores_high():
    rng = np.random.RandomState(0)
    gt = np.zeros((60, 120), np.float32)
    yy, xx = np.mgrid[0:60, 0:120]
    gt += np.exp(-((yy - 30) ** 2 + (xx - 60) ** 2) / 30.0)
    sal = gt + rng.rand(60, 120).astype(np.float32) * 1e-3
    assert auc_judd(sal, gt, rng=np.random.RandomState(1)) > 0.95
    assert corr_coeff(sal, gt) > 0.99
    assert similarity(sal, gt) > 0.9


def test_empty_fixation_raises():
    with pytest.raises(ValueError):
        auc_judd(np.ones((10, 10)), np.zeros((10, 10)))


def test_numpy_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    m = rng.rand(64, 128).astype(np.float32)
    a = cv2.resize(m, (240, 120), interpolation=cv2.INTER_LINEAR)
    b = _resize_bilinear_np(m, 120, 240)
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_resize_eval_is_bilinear_not_lanczos():
    # Documents the reference's cv2.resize positional-arg quirk: the
    # evaluation resize must be bilinear.
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(3)
    m = rng.rand(64, 128).astype(np.float32)
    positional = cv2.resize(m, (240, 120), cv2.INTER_LANCZOS4)  # dst slot!
    np.testing.assert_array_equal(resize_eval(m), positional)
