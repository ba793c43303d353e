"""Generate golden geometry fixtures from the reference implementation.

Dumps the reference's precomputed sampling maps and a naive cube->equi
resample result to tests/golden/geometry.npz.  Shims: torchvision is not
installed (only imported, never used, by utils/sph_utils.py:8), and
np.float was removed from modern numpy.
"""

import sys
import types

import numpy as np

# --- shims for 2018-era imports ------------------------------------------
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
np.int = int
np.float = float

sys.path.insert(0, "/root/reference")

from utils.equi_to_cube import Equi2Cube  # noqa: E402
from utils import sph_utils  # noqa: E402


def ref_cube2equi_map(input_w):
    """Reference Cube2Equi.__init__ precompute (utils/cube_to_equi.py:12-35).

    That file is py2-only syntax (`.cuda(async=True)`), so we drive the same
    sph_utils call chain it performs instead of importing it.
    """
    in_width = input_w
    out_w, out_h = in_width * 4, in_width * 2
    face_map = np.zeros((out_h, out_w))
    xx, yy = np.meshgrid(range(out_w), range(out_h))
    theta, phi = sph_utils.xy2angle(xx, yy, out_w, out_h)
    theta = sph_utils.pruned_inf(theta)
    phi = sph_utils.pruned_inf(phi)
    x, y, z = sph_utils.to_3dsphere(theta, phi, 1)
    face_map = sph_utils.get_face(x, y, z, face_map)
    x_o, y_o = sph_utils.face_to_cube_coord(face_map, x, y, z)
    out_coord = np.transpose(np.array([x_o, y_o]), (1, 2, 0))
    out_coord = sph_utils.norm_to_cube(out_coord, in_width)
    return out_coord, face_map

rng = np.random.RandomState(0)
out = {}

# Equi2Cube maps at a reduced operating point (fast) + the real one.
for tag, (face_w, eh, ew) in {
    "small": (32, 128, 256),
    "op": (224, 960, 1920),
}.items():
    img = np.zeros((eh, ew, 3))
    e2c = Equi2Cube(face_w, img)
    out[f"e2c_{tag}_inx"] = np.stack(e2c.inXs).reshape(6, face_w, face_w)
    out[f"e2c_{tag}_iny"] = np.stack(e2c.inYs).reshape(6, face_w, face_w)

# Cube2Equi maps for the CAM resolution (7) and a bigger one.
for w in (7, 16):
    coord, face = ref_cube2equi_map(w)
    out[f"c2e_{w}_coord"] = coord
    out[f"c2e_{w}_face"] = face.astype(np.int64)

# Naive cube->equi resample (reference's in-repo NumPy oracle,
# utils/sph_utils.py:159-255) with interpolation on random faces.
w = 16
faces = rng.rand(6, w, w, 5).astype(np.float32)
coord, face = ref_cube2equi_map(w)
# py2->py3 shim: the reference computes in_width = out_w/4 (true division on
# py3), making its flat gather indices float; cast them back for np.take.
_np_take = np.take
np.take = lambda a, idx, **kw: _np_take(a, np.asarray(idx).astype(np.int64), **kw)
res = sph_utils.naive_cube2equi_layer(faces, coord, face, no_interp=False)
np.take = _np_take
out["naive_in"] = faces
out["naive_out"] = res[0]  # [2w, 4w, 5]

# cv2.remap outputs for the runtime equi->cube path.
import cv2  # noqa: E402

eh, ew, fw = 128, 256, 32
img = rng.rand(eh, ew, 3).astype(np.float32)
e2c = Equi2Cube(fw, img)
cubes = e2c.to_cube(img)
out["remap_in"] = img
out["remap_out"] = np.stack([cubes[i] for i in range(6)])

np.savez_compressed("tests/golden/geometry.npz", **out)
print("wrote tests/golden/geometry.npz:", sorted(out))
