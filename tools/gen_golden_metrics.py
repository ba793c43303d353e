"""Generate metric goldens by running the reference eval functions.

utils/eval_saliency.py imports utils.cube_to_equi which is py2-only syntax,
so we stub that module before import (the four metric functions don't use
it).  np.random is seeded per call so our implementations can replay the
identical RNG stream.
"""

import sys
import types

import numpy as np

stub = types.ModuleType("utils.cube_to_equi")
stub.Cube2Equi = object
sys.modules["utils.cube_to_equi"] = stub
sys.path.insert(0, "/root/reference")

from utils import eval_saliency as ref  # noqa: E402

rng = np.random.RandomState(7)
out = {}
cases = []
for i in range(3):
    sal = rng.rand(64, 128).astype(np.float32) ** 2
    gt = np.zeros((64, 128), np.float32)
    # a few gaussian blobs as plausible fixation density
    for _ in range(3):
        cy, cx = rng.randint(8, 56), rng.randint(8, 120)
        yy, xx = np.mgrid[0:64, 0:128]
        gt += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 40.0)
    cases.append((sal, gt))

for i, (sal, gt) in enumerate(cases):
    out[f"sal{i}"] = sal
    out[f"gt{i}"] = gt
    np.random.seed(123 + i)
    out[f"auc_judd{i}"] = ref.AUC_Judd(sal.copy(), gt.copy())
    np.random.seed(123 + i)
    out[f"auc_borji{i}"] = ref.AUC_Borji(sal.copy(), gt.copy())
    out[f"cc{i}"] = ref.CorrCoeff(sal.copy(), gt.copy())
    out[f"sim{i}"] = ref.similarity(sal.copy(), gt.copy())

np.savez_compressed("tests/golden/metrics.npz", **out)
print("wrote tests/golden/metrics.npz")
for i in range(3):
    print(i, out[f"auc_judd{i}"], out[f"auc_borji{i}"], out[f"cc{i}"], out[f"sim{i}"])
