"""Shimmed loader for running the 2018-era reference at /root/reference on
modern python3/torch/numpy — used ONLY by golden generators (never by the
package or tests at runtime).

Shims (each documented with the reference line that needs it):
  - ``np.int`` / ``np.float`` removed from modern numpy
    (model/cube_pad.py:13,64, utils/cube_to_equi.py:49).
  - ``torchvision`` not installed; only imported, never used on our paths
    (utils/sph_utils.py:8, temporal_model/test_temporal.py:6).
  - ``ruamel_yaml`` not installed; stubbed with PyYAML's safe_load
    (dataset_feat_extractor.py:12, test_temporal.py:10).
  - ``.cuda(async=True)`` is a py3 syntax error (``async`` became a keyword):
    source text is rewritten to ``non_blocking=True`` before exec
    (class_activation_model.py:58, cube_to_equi.py:47-49,
    test_temporal.py:72-78).
  - CPU-only run: ``Tensor.cuda`` / ``Module.cuda`` are no-ops.
  - ``grid_sample`` on PyTorch 0.3 (the reference era) had implicit
    align_corners=True; modern torch defaults to False, so calls are pinned
    back to the 0.3 semantics (utils/cube_to_equi.py:64-65).
"""

import importlib.util
import sys
import types
import zlib

import numpy as np
import torch

REF = "/root/reference"


def install_shims():
    np.int = int
    np.float = float
    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # mark as package so `import torchvision.transforms` works
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)

    if "ruamel_yaml" not in sys.modules:
        import yaml as _pyyaml

        ry = types.ModuleType("ruamel_yaml")
        ry.safe_load = _pyyaml.safe_load
        sys.modules["ruamel_yaml"] = ry

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # CubePadding's use_gpu=True default builds index tensors via
    # torch.cuda.LongTensor (model/cube_pad.py:75-78) — alias to CPU types.
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.FloatTensor = torch.FloatTensor

    _grid_sample = torch.nn.functional.grid_sample

    def grid_sample_03(input, grid, *a, **k):
        k.setdefault("align_corners", True)  # PyTorch 0.3 semantics
        return _grid_sample(input, grid, *a, **k)

    torch.nn.functional.grid_sample = grid_sample_03

    # Same era pin for functional.upsample (train_temporal.py:132-135):
    # torch 0.3 bilinear upsample was always align_corners=True; the modern
    # deprecated alias defaults to False.
    def upsample_03(x, size=None, **k):
        k.pop("align_corners", None)
        mode = k.pop("mode", "nearest")  # torch-0.3 default
        ac = {"align_corners": True} if mode != "nearest" else {}
        return torch.nn.functional.interpolate(x, size=size, mode=mode, **ac, **k)

    torch.nn.functional.upsample = upsample_03

    # PIL removed the CUBIC alias (utils/utils.py:22 heatmap resize).
    from PIL import Image

    if not hasattr(Image, "CUBIC"):
        Image.CUBIC = Image.BICUBIC

    if REF not in sys.path:
        sys.path.insert(0, REF)


def load_ref_module(name: str, path: str):
    """Import a reference file with the ``async=True`` source rewrite."""
    with open(path) as f:
        src = f.read()
    src = src.replace("async=True", "non_blocking=True")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    code = compile(src, path, "exec")
    exec(code, mod.__dict__)
    return mod


def synth_tensor(key: str, shape, scheme: str = "v1"):
    """Deterministic per-key synthetic weight values, regenerable by tests
    from a stored key/shape manifest without committing the weights.

    scheme "v1": plain N(0, 0.05) — value-parity goldens
      (tools/gen_golden_models.py); spatial structure collapses through a
      deep net (random 3x3 convs homogenize; layer4 comes out spatially
      constant), which is fine for activation comparison but NOT for
      metric-level goldens.
    scheme "v2": delta-dominant conv kernels (strong center tap + weak
      neighbors) with near-identity BN — spatial structure survives all 50
      layers, so end-to-end saliency maps have real dynamic range and the
      AUC/CC metrics are well-conditioned.
    """
    rs = np.random.RandomState(zlib.crc32((scheme + ":" + key).encode()) % (2**31))
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if scheme == "v1":
        if key.endswith("running_var"):
            return rs.uniform(0.5, 2.0, size=shape).astype(np.float32)
        return (rs.randn(*shape) * 0.05).astype(np.float32)
    if key.endswith("running_var"):
        return rs.uniform(0.8, 1.2, size=shape).astype(np.float32)
    if key.endswith("running_mean"):
        return (rs.randn(*shape) * 0.1).astype(np.float32)
    if len(shape) == 1 and key.endswith(".weight"):  # BN gamma
        return rs.uniform(0.9, 1.1, size=shape).astype(np.float32)
    if len(shape) == 1:  # bias
        return (rs.randn(*shape) * 0.1).astype(np.float32)
    if len(shape) == 4:  # conv [O, I, kh, kw]
        o, i, kh, kw = shape
        w = (rs.randn(*shape) * (0.15 / np.sqrt(i * kh * kw))).astype(np.float32)
        w[:, :, kh // 2, kw // 2] += (rs.randn(o, i) * (1.2 / np.sqrt(i))).astype(
            np.float32
        )
        return w
    return (rs.randn(*shape) * 0.05).astype(np.float32)


def fill_state_dict(model, scheme: str = "v1"):
    """Fill every state-dict tensor deterministically; returns the
    {key: shape} manifest."""
    sd = model.state_dict()
    manifest = {}
    for key, t in sd.items():
        manifest[key] = tuple(t.shape)
        t.copy_(torch.from_numpy(synth_tensor(key, tuple(t.shape), scheme)).to(t.dtype))
    return manifest
