"""Generate model-parity goldens by running the reference nets in torch/CPU.

Strategy: fill every state-dict tensor of the *reference* model with values
from a per-key deterministic RNG (so tests can regenerate the identical
state dict without storing 100 MB of weights), run the reference forward on
a fixed input, and store only inputs/outputs + the key/shape manifest.

Shims for the 2018-era code on modern torch/numpy:
  - np.int removed (model/cube_pad.py:13,64)
  - CubePadding defaults to CUDA index tensors; we flip use_gpu off
    post-construction (model/cube_pad.py:75-78)
"""

import importlib.util
import sys
import types
import zlib

import numpy as np
import torch

np.int = int
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
sys.path.insert(0, "/root/reference")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# 'model' package namespace so `from model.cube_pad import CubePad` resolves.
pkg = types.ModuleType("model")
pkg.__path__ = ["/root/reference/model"]
sys.modules["model"] = pkg
cube_pad_mod = _load("model.cube_pad", "/root/reference/model/cube_pad.py")
resnet_mod = _load("model.resnet_cubic", "/root/reference/model/resnet_cubic.py")
clstm_mod = _load("model.clstm", "/root/reference/model/clstm.py")


def fill_state_dict(model):
    """Deterministic per-key values; returns manifest {key: shape}."""
    sd = model.state_dict()
    manifest = {}
    for key, t in sd.items():
        manifest[key] = tuple(t.shape)
        val = synth_tensor(key, tuple(t.shape))
        t.copy_(torch.from_numpy(val).to(t.dtype))
    return manifest


def synth_tensor(key: str, shape):
    rs = np.random.RandomState(zlib.crc32(key.encode()) % (2**31))
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if key.endswith("running_var"):
        return rs.uniform(0.5, 2.0, size=shape).astype(np.float32)
    return (rs.randn(*shape) * 0.05).astype(np.float32)


def disable_gpu_pads(model):
    for m in model.modules():
        if isinstance(m, cube_pad_mod.CubePadding):
            m.use_gpu = False


out = {}

# ---------------- ResNet-50 cubic -----------------------------------------
torch.manual_seed(0)
net = resnet_mod.ResNet(resnet_mod.Bottleneck, [3, 4, 6, 3], cp=True)
manifest = fill_state_dict(net)
disable_gpu_pads(net)
net.eval()

feats_box = []
net.layer4.register_forward_hook(lambda m, i, o: feats_box.append(o.detach().numpy()))

rng = np.random.RandomState(42)
x = rng.randn(6, 3, 224, 224).astype(np.float32) * 0.5
with torch.no_grad():
    logits = net(torch.from_numpy(x)).numpy()

out["resnet50_in"] = x
out["resnet50_logits"] = logits
out["resnet50_feats"] = feats_box[0]
out["resnet50_keys"] = np.array(list(manifest.keys()))
out["resnet50_shapes"] = np.array([",".join(map(str, s)) for s in manifest.values()])

# NOTE: no resnet18/34 goldens are possible — the reference's BasicBlock
# constructors are broken as shipped (ResNet._make_layer passes cp= to
# BasicBlock, which does not accept it: model/resnet_cubic.py:36,155-159),
# so `resnet18()`/`resnet34()` raise TypeError before any forward runs.
# Our resnet18/34 implement the documented architecture (BasicBlock without
# cube padding) and are covered by shape/behaviour tests instead.

# ---------------- ConvLSTM cell -------------------------------------------
cell_net = clstm_mod.ConvLSTMCell(8, 8, cp=True)
manifest = fill_state_dict(cell_net)
disable_gpu_pads(cell_net)
cell_net.eval()

seq = rng.randn(3, 6, 8, 7, 7).astype(np.float32)
h = torch.from_numpy(seq[0].copy())
c = torch.from_numpy(seq[0].copy())
hiddens, cells = [], []
with torch.no_grad():
    for t in range(3):
        h, c = cell_net(torch.from_numpy(seq[t]), [h, c])
        hiddens.append(h.numpy().copy())
        cells.append(c.numpy().copy())

out["clstm_seq"] = seq
out["clstm_hiddens"] = np.stack(hiddens)
out["clstm_cells"] = np.stack(cells)
out["clstm_keys"] = np.array(list(manifest.keys()))
out["clstm_shapes"] = np.array([",".join(map(str, s)) for s in manifest.values()])

np.savez_compressed("tests/golden/models.npz", **out)
print("wrote tests/golden/models.npz:", {k: getattr(v, "shape", None) for k, v in out.items()})
