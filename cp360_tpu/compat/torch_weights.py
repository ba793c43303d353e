"""PyTorch checkpoint converters (.pth -> our nested-dict params / .npz).

Needed to reproduce the published metrics without retraining: the reference
uses torchvision-zoo ResNet-50 weights (model/resnet_cubic.py:228-237) and
ships a trained CLSTM .pth (temporal_model/test_temporal.py:147-150).

Layout mapping:
  torch conv OIHW  -> ours HWIO (transpose 2,3,1,0)
  torch linear [out, in] -> ours {'w': [in, out], 'b': [out]}
  torch BatchNorm {weight, bias, running_mean, running_var}
     -> {'scale', 'bias', 'mean', 'var'}

Loading is size-tolerant in the same spirit as the reference's homemade
loaders (model/resnet_cubic.py:183-201 — skip mismatched keys;
model/clstm.py:92-101 — positional/sequential assignment for renamed keys).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from cp360_tpu.models.resnet import ARCHS


def _conv_w(t) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(t).transpose(2, 3, 1, 0))


def _bn(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth state dict into numpy (host-only torch usage)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def convert_resnet_state_dict(sd: Mapping[str, np.ndarray], arch: str = "resnet50") -> dict:
    """torchvision-style ResNet state dict -> our nested params."""
    kind, depths = ARCHS[arch]
    params = {
        "conv1": {"w": _conv_w(sd["conv1.weight"])},
        "bn1": _bn(sd, "bn1"),
    }
    n_convs = 3 if kind == "bottleneck" else 2
    for li, depth in enumerate(depths):
        stage = []
        for bi in range(depth):
            pre = f"layer{li + 1}.{bi}"
            blk = {}
            for ci in range(1, n_convs + 1):
                blk[f"conv{ci}"] = {"w": _conv_w(sd[f"{pre}.conv{ci}.weight"])}
                blk[f"bn{ci}"] = _bn(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": {"w": _conv_w(sd[f"{pre}.downsample.0.weight"])},
                    "bn": _bn(sd, f"{pre}.downsample.1"),
                }
            stage.append(blk)
        params[f"layer{li + 1}"] = stage
    params["fc"] = {
        "w": np.ascontiguousarray(np.asarray(sd["fc.weight"]).T),
        "b": np.asarray(sd["fc.bias"]),
    }
    return params


_CLSTM_NAME_MAP = {"Conv1": "conv1", "Conv2": "conv2", "Gates": "gates"}


def convert_clstm_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference ConvLSTMCell state dict -> our nested params.

    Accepts the reference's key names (Conv1/Conv2/Gates .weight/.bias,
    model/clstm.py:28-34).  For checkpoints with renamed keys, falls back to
    positional order like the reference's sequential loader
    (model/clstm.py:92-101): conv1.w, conv1.b, conv2.w, conv2.b, gates.w,
    gates.b.
    """
    named = {}
    for k, v in sd.items():
        m = re.match(r"^(Conv1|Conv2|Gates)\.(weight|bias)$", k)
        if m:
            named[(_CLSTM_NAME_MAP[m.group(1)], m.group(2))] = np.asarray(v)

    if len(named) == 6:
        get = lambda n, p: named[(n, p)]  # noqa: E731
    else:
        vals = list(sd.values())
        if len(vals) < 6:
            raise ValueError(f"CLSTM checkpoint has {len(vals)} tensors, expected 6")
        order = [("conv1", "weight"), ("conv1", "bias"), ("conv2", "weight"),
                 ("conv2", "bias"), ("gates", "weight"), ("gates", "bias")]
        named = {o: np.asarray(v) for o, v in zip(order, vals)}
        get = lambda n, p: named[(n, p)]  # noqa: E731

    return {
        name: {"w": _conv_w(get(name, "weight")), "b": np.asarray(get(name, "bias"))}
        for name in ("conv1", "conv2", "gates")
    }


# ---------------------------------------------------------------------------
# Flat .npz round-trip (our portable checkpoint format).
# ---------------------------------------------------------------------------


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def unflatten_params(flat: Mapping[str, np.ndarray]):
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_npz(path: str, params) -> None:
    from cp360_tpu.utils.atomic import atomic_savez_compressed

    if not path.endswith(".npz"):
        path += ".npz"  # np.savez would append it after the atomic rename
    atomic_savez_compressed(path, **flatten_params(params))


def load_npz(path: str):
    with np.load(path) as f:
        return unflatten_params(dict(f))


def merge_pretrained_tolerant(init_params, converted, log_fn=print):
    """Size-tolerant weight merge, in the spirit of the reference's loaders
    (model/resnet_cubic.py:183-201, model/clstm.py:92-101): copy every leaf
    from ``converted`` whose shape matches the counterpart in
    ``init_params``; keep the init value (and log) otherwise.

    Use when loading e.g. 1000-class zoo weights into a differently-headed
    model.
    """
    flat_init = flatten_params(init_params)
    flat_conv = flatten_params(converted)
    out = dict(flat_init)
    for key, val in flat_conv.items():
        if key not in flat_init:
            log_fn(f"skip unexpected key '{key}'")
            continue
        if flat_init[key].shape != val.shape:
            log_fn(
                f"skip key '{key}' due to inconsistent size "
                f"{val.shape} vs {flat_init[key].shape}"
            )
            continue
        out[key] = val
    return unflatten_params(out)


def convert_pth(path_in: str, path_out: str, kind: str, arch: str = "resnet50") -> None:
    """CLI-friendly one-shot converter: kind in {'resnet', 'clstm'}."""
    sd = load_torch_state_dict(path_in)
    if kind == "resnet":
        params = convert_resnet_state_dict(sd, arch)
    elif kind == "clstm":
        params = convert_clstm_state_dict(sd)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    save_npz(path_out, params)


# ---------------------------------------------------------------------------
# Export: our nested params -> reference/torchvision torch state dicts.
#
# The inverse bridge: train or fine-tune here, then evaluate/deploy with the
# reference repo (its temporal driver torch.load()s a CLSTM .pth,
# temporal_model/test_temporal.py:147-150; its backbone loader consumes
# torchvision-style ResNet dicts, model/resnet_cubic.py:183-201).  Exact
# inverses of the converters above: convert(export(p)) == p leaf-for-leaf.
# ---------------------------------------------------------------------------


def _torch_float(a: np.ndarray) -> np.ndarray:
    """Leaf -> a dtype torch.from_numpy accepts (bf16 numpy does not)."""
    a = np.asarray(a)
    if a.dtype.kind == "f" and a.dtype != np.float32:
        a = a.astype(np.float32)
    return np.ascontiguousarray(a)


def _conv_w_inv(w) -> np.ndarray:
    return _torch_float(np.asarray(w).transpose(3, 2, 0, 1))  # HWIO -> OIHW


def _bn_inv(bn: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {
        f"{prefix}.weight": _torch_float(bn["scale"]),
        f"{prefix}.bias": _torch_float(bn["bias"]),
        f"{prefix}.running_mean": _torch_float(bn["mean"]),
        f"{prefix}.running_var": _torch_float(bn["var"]),
        # torchvision modules carry this buffer; emit it so strict
        # load_state_dict into a stock torchvision ResNet works too
        f"{prefix}.num_batches_tracked": np.asarray(0, dtype=np.int64),
    }


def export_resnet_state_dict(params: Mapping, arch: str = "resnet50") -> Dict[str, np.ndarray]:
    """Our nested ResNet params -> a torchvision-style flat state dict."""
    kind, depths = ARCHS[arch]
    sd = {"conv1.weight": _conv_w_inv(params["conv1"]["w"])}
    sd.update(_bn_inv(params["bn1"], "bn1"))
    n_convs = 3 if kind == "bottleneck" else 2
    for li, depth in enumerate(depths):
        stage = params[f"layer{li + 1}"]
        if len(stage) != depth:
            raise ValueError(
                f"layer{li + 1} has {len(stage)} blocks, {arch} expects {depth}"
            )
        for bi, blk in enumerate(stage):
            pre = f"layer{li + 1}.{bi}"
            for ci in range(1, n_convs + 1):
                sd[f"{pre}.conv{ci}.weight"] = _conv_w_inv(blk[f"conv{ci}"]["w"])
                sd.update(_bn_inv(blk[f"bn{ci}"], f"{pre}.bn{ci}"))
            if "downsample" in blk:
                sd[f"{pre}.downsample.0.weight"] = _conv_w_inv(
                    blk["downsample"]["conv"]["w"])
                sd.update(_bn_inv(blk["downsample"]["bn"], f"{pre}.downsample.1"))
    sd["fc.weight"] = _torch_float(np.asarray(params["fc"]["w"]).T)
    sd["fc.bias"] = _torch_float(params["fc"]["b"])
    return sd


def export_clstm_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    """Our nested CLSTM params -> the reference's Conv1/Conv2/Gates keys
    (model/clstm.py:28-34), directly torch.load()-able by its temporal
    driver."""
    inv = {v: k for k, v in _CLSTM_NAME_MAP.items()}
    sd = {}
    for name in ("conv1", "conv2", "gates"):
        sd[f"{inv[name]}.weight"] = _conv_w_inv(params[name]["w"])
        sd[f"{inv[name]}.bias"] = _torch_float(params[name]["b"])
    return sd


def export_pth(path_in: str, path_out: str, kind: str, arch: str = "resnet50") -> None:
    """CLI-friendly one-shot exporter: our .npz -> reference .pth."""
    import torch

    params = load_npz(path_in)
    if kind == "resnet":
        sd = export_resnet_state_dict(params, arch)
    elif kind == "clstm":
        sd = export_clstm_state_dict(params)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path_out)
