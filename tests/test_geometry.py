"""Geometry map builders vs reference-generated goldens."""

import os

import numpy as np
import pytest

from cp360_tpu.geometry import build_cube2equi_map, build_equi2cube_maps

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "geometry.npz"))


@pytest.mark.parametrize(
    "tag,face_w,eh,ew",
    [("small", 32, 128, 256), ("op", 224, 960, 1920)],
)
def test_equi2cube_maps_match_reference(tag, face_w, eh, ew):
    in_x, in_y = build_equi2cube_maps(face_w, eh, ew)
    np.testing.assert_allclose(in_x, GOLDEN[f"e2c_{tag}_inx"], atol=1e-9)
    np.testing.assert_allclose(in_y, GOLDEN[f"e2c_{tag}_iny"], atol=1e-9)


@pytest.mark.parametrize("w", [7, 16])
def test_cube2equi_map_matches_reference(w):
    coords, face_map = build_cube2equi_map(w)
    np.testing.assert_array_equal(face_map, GOLDEN[f"c2e_{w}_face"])
    np.testing.assert_allclose(coords, GOLDEN[f"c2e_{w}_coord"], atol=1e-12)


def test_cube2equi_coords_in_range():
    coords, face_map = build_cube2equi_map(7)
    assert coords.min() >= 0.0 and coords.max() <= 6.0
    assert set(np.unique(face_map)) == set(range(6))
