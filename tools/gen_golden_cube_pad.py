"""Generate golden CubePad fixtures by running the reference implementation.

Runs /root/reference/model/cube_pad.py (PyTorch) on random inputs and dumps
input/output pairs to tests/golden/cube_pad.npz.  Requires the reference
checkout; the committed .npz is what tests consume, so CI never needs it.

Compatibility shims for the 2018-era code on modern numpy/CPU:
  - np.int was removed in numpy>=1.24 (reference model/cube_pad.py:13,64)
  - use_gpu=False so flip() uses CPU LongTensor (reference model/cube_pad.py:75-78)
"""

import importlib.util
import sys

import numpy as np
import torch

np.int = int  # shim for the reference's `type(x) == np.int` checks

spec = importlib.util.spec_from_file_location(
    "ref_cube_pad", "/root/reference/model/cube_pad.py"
)
ref = importlib.util.module_from_spec(spec)
sys.modules["ref_cube_pad"] = ref
spec.loader.exec_module(ref)

rng = np.random.RandomState(0)

CASES = [
    ("p1", 8, 1),
    ("p2", 8, 2),
    ("p3", 8, 3),
    ("asym_1203", 8, [1, 2, 0, 3]),
    ("asym_0011", 8, [0, 0, 1, 1]),
    ("asym_2001", 8, [2, 0, 0, 1]),
    ("asym_0102", 8, [0, 1, 0, 2]),
    ("p1_sz7", 7, 1),  # the CLSTM operates on 7x7 faces
]

out = {}
for name, hw, pad in CASES:
    x = rng.randn(6, 3, hw, hw).astype(np.float32)
    cp = ref.CubePadding(pad, use_gpu=False)
    with torch.no_grad():
        y = cp(torch.from_numpy(x)).numpy()
    out[f"{name}_in"] = x
    out[f"{name}_out"] = y
    out[f"{name}_pad"] = np.asarray(pad if isinstance(pad, list) else [pad, pad, pad, pad])

# Batched CubePad wrapper case ([12, C, H, W] = two cubes).
x = rng.randn(12, 2, 8, 8).astype(np.float32)
cp = ref.CubePad(2, use_gpu=False)
with torch.no_grad():
    y = cp(torch.from_numpy(x)).numpy()
out["batch2_in"] = x
out["batch2_out"] = y
out["batch2_pad"] = np.asarray([2, 2, 2, 2])

np.savez_compressed("tests/golden/cube_pad.npz", **out)
print("wrote tests/golden/cube_pad.npz with", len(out), "arrays")
