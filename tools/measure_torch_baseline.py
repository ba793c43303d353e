"""Measure the reference pipeline's per-frame throughput on torch-CPU.

Times the stage-1 hot path exactly as the reference executes it per frame
(static_model/dataset_feat_extractor.py:138-176): PIL LANCZOS resize ->
Equi2Cube cv2.remap x6 faces -> im_norm -> cube-padded ResNet-50 forward
(torch CPU) -> CAM NumPy matmul.  Random weights (the zoo checkpoint is not
downloadable here); throughput is weight-independent.

Writes BENCH_BASELINE.json {"torch_cpu_fps": ..., "frames": N, ...}.
"""

import importlib.util
import json
import sys
import time
import types

import numpy as np
import torch

np.int = int
np.float = float
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
sys.path.insert(0, "/root/reference")

pkg = types.ModuleType("model")
pkg.__path__ = ["/root/reference/model"]
sys.modules["model"] = pkg


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


cube_pad_mod = _load("model.cube_pad", "/root/reference/model/cube_pad.py")
resnet_mod = _load("model.resnet_cubic", "/root/reference/model/resnet_cubic.py")
from utils.equi_to_cube import Equi2Cube  # noqa: E402

torch.manual_seed(0)
net = resnet_mod.ResNet(resnet_mod.Bottleneck, [3, 4, 6, 3], cp=True)
for m in net.modules():
    if isinstance(m, cube_pad_mod.CubePadding):
        m.use_gpu = False
net.eval()

feats_box = []
net.layer4.register_forward_hook(lambda m, i, o: feats_box.append(o.detach().numpy()))
fc_w = net.state_dict()["fc.weight"].numpy()
if fc_w.min() < 0:
    fc_w = fc_w - fc_w.min()

from PIL import Image

rng = np.random.RandomState(0)
frame = (rng.rand(480, 960, 3) * 255).astype(np.uint8)

N_WARM, N_MEAS = 1, 5
times = []
e2c = None
for i in range(N_WARM + N_MEAS):
    t0 = time.time()
    img = Image.fromarray(frame).resize((1920, 960), resample=Image.LANCZOS)
    arr = np.array(img) / 255.0
    if e2c is None:
        e2c = Equi2Cube(224, arr)
    cubes = e2c.to_cube(arr)
    batch = np.stack(
        [
            (cubes[k] - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
            for k in range(6)
        ]
    ).astype(np.float32)
    feats_box.clear()
    with torch.no_grad():
        net(torch.from_numpy(batch.transpose(0, 3, 1, 2).copy()))
    feats = feats_box[0]
    b, c, h, w = feats.shape
    scores = np.stack([fc_w.dot(feats[j].reshape(c, h * w)) for j in range(b)])
    scores = scores.reshape(b, 1000, h, w)
    dt = time.time() - t0
    if i >= N_WARM:
        times.append(dt)
    print(f"frame {i}: {dt:.2f}s")

fps = 1.0 / float(np.median(times))
out = {
    "torch_cpu_fps": fps,
    "median_s_per_frame": float(np.median(times)),
    "frames_measured": N_MEAS,
    "pipeline": "PIL resize + Equi2Cube.to_cube + im_norm + cubic resnet50 fwd + CAM matmul",
    "hardware": "container CPU (torch eager, fp32)",
}
with open("BENCH_BASELINE.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
