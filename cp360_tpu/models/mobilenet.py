"""Cube-padded MobileNetV2 backbone + CAM head.

A third backbone family beyond the reference's ResNet (model/
resnet_cubic.py) and the VGG16 surface it gestures at — picked because its
GAP -> Linear classifier is already the CAM formulation (score maps =
``einsum(classifier_w, features)``, exactly like the ResNet path in
static_model/class_activation_model.py:70-83), and because its depthwise
convolutions exercise cube padding across a conv type the reference never
touches: every 3x3 (all of them depthwise, plus the stem) is preceded by
CubePad and runs VALID, so features are seam-free across face boundaries.

Structure and state-dict layout follow torchvision ``mobilenet_v2`` so the
converter (``convert_mobilenet_v2``) consumes its zoo checkpoints:
stem ConvBNReLU6 (3->32, s2), inverted-residual stages with expansion
t/(channels c/repeats n/stride s) = (1,16,1,1) (6,24,2,2) (6,32,3,2)
(6,64,4,2) (6,96,3,1) (6,160,3,2) (6,320,1,1), a 1x1 ConvBNReLU6 to 1280,
GAP, Linear(1280 -> num_classes).  224-face input -> 7x7x1280 feature
cubes, the same spatial operating point as the ResNet-50 CAM artifacts.
"""

from __future__ import annotations

from functools import partial
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.models import layers

# (expansion t, out channels c, repeats n, first stride s)
_V2_CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
_LAST = 1280


def _pad(x: jax.Array, use_cp: bool) -> jax.Array:
    return layers.pad_faces(x, 1, use_cp)


def _relu6(x: jax.Array) -> jax.Array:
    return jnp.minimum(jax.nn.relu(x), jnp.asarray(6.0, x.dtype))


def init_mobilenet_v2_params(key: jax.Array, num_classes: int = 1000,
                             dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))

    def cbr(cin, cout, k):
        return {"w": layers.he_conv(next(keys), k, k, cin, cout, dtype),
                "bn": layers.bn_params(cout, dtype)}

    def dw(c):
        # He fan-out for a DEPTHWISE conv is kh*kw*cout/groups = 9, not
        # 9*c (torch's kaiming_normal with groups); he_conv doesn't know
        # about groups, so scale directly
        import math

        w = jax.random.normal(next(keys), (3, 3, 1, c), dtype) * math.sqrt(2.0 / 9.0)
        return {"w": w, "bn": layers.bn_params(c, dtype)}

    blocks = []
    cin = 32
    for t, c, n, s in _V2_CFG:
        for i in range(n):
            hidden = cin * t
            blk = {}
            if t != 1:
                blk["expand"] = cbr(cin, hidden, 1)
            blk["dw"] = dw(hidden)
            blk["project"] = cbr(hidden, c, 1)
            blocks.append(blk)
            cin = c
    return {
        "stem": cbr(3, 32, 3),
        "blocks": blocks,
        "head": cbr(cin, _LAST, 1),
        "fc": {
            "w": jax.random.normal(next(keys), (_LAST, num_classes), dtype) * 0.01,
            "b": jnp.zeros((num_classes,), dtype),
        },
    }


def _block_strides():
    out = []
    for t, c, n, s in _V2_CFG:
        for i in range(n):
            out.append((t, s if i == 0 else 1))
    return tuple(out)


_STRIDES = _block_strides()


@partial(jax.jit, static_argnames=("use_cube_pad", "compute_dtype", "with_logits"))
def mobilenet_v2_apply(
    params: dict,
    x: jax.Array,
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    with_logits: bool = True,
):
    """Forward: [N, 6, H, W, 3] (or [N*6, H, W, 3]) -> (logits, head feats)."""
    if x.ndim == 5:
        x = x.reshape(-1, *x.shape[2:])
    if compute_dtype is not None:
        # one entry cast keeps the whole trunk in compute dtype (see
        # resnet_apply — halves elementwise HBM traffic under bf16)
        x = x.astype(compute_dtype)

    def cbr(p, out, stride=1, k=3, groups=1, act=True):
        if k == 3:
            out = _pad(out, use_cube_pad)
        out = layers.conv2d(out, p["w"], stride=stride,
                            compute_dtype=compute_dtype, groups=groups)
        out = layers.batch_norm(out, p["bn"])
        return _relu6(out) if act else out

    out = cbr(params["stem"], x, stride=2)
    for blk, (t, stride) in zip(params["blocks"], _STRIDES):
        inp = out
        if t != 1:
            out = cbr(blk["expand"], out, k=1)
        out = cbr(blk["dw"], out, stride=stride, groups=out.shape[-1])
        out = cbr(blk["project"], out, k=1, act=False)
        if stride == 1 and inp.shape[-1] == out.shape[-1]:
            out = inp + out  # residual (torchvision use_res_connect)
    feats = cbr(params["head"], out, k=1)

    if not with_logits:
        return None, feats
    pooled = jnp.mean(feats, axis=(1, 2))
    logits = layers.linear(pooled, params["fc"])
    return logits, feats


@partial(jax.jit, static_argnames=("use_cube_pad", "compute_dtype"))
def mobilenet_v2_cam_forward(params: dict, cubes: jax.Array,
                             use_cube_pad: bool = True,
                             compute_dtype=jnp.bfloat16):
    """Cube faces [N, 6, H, W, 3] -> (CAM score cube, head feature cube)."""
    from cp360_tpu.models.cam import cam_scores

    n = cubes.shape[0]
    _, feats = mobilenet_v2_apply(
        params, cubes, use_cube_pad=use_cube_pad,
        compute_dtype=compute_dtype, with_logits=False,
    )
    scores = cam_scores(feats, params["fc"]["w"])
    h, w = feats.shape[1:3]
    return scores.reshape(n, 6, h, w, -1), feats.reshape(n, 6, h, w, -1)


def _cw(t) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(t).transpose(2, 3, 1, 0))


def _bn(sd: Mapping[str, np.ndarray], pre: str) -> dict:
    return {"scale": np.asarray(sd[f"{pre}.weight"]),
            "bias": np.asarray(sd[f"{pre}.bias"]),
            "mean": np.asarray(sd[f"{pre}.running_mean"]),
            "var": np.asarray(sd[f"{pre}.running_var"])}


def convert_mobilenet_v2(sd: Mapping[str, np.ndarray]) -> dict:
    """torchvision ``mobilenet_v2`` state dict -> our nested params.

    torchvision layout: features.0 = stem ConvBNReLU; features.1..17 =
    InvertedResidual with conv.{0.0,0.1,1,2} (t==1) or
    conv.{0.0,0.1,1.0,1.1,2,3} (t>1); features.18 = last ConvBNReLU;
    classifier.1 = Linear.  Depthwise torch weights [C,1,3,3] land as
    HWIO [3,3,1,C] (groups=C).
    """
    blocks = []
    fi = 1
    for t, c, n, s in _V2_CFG:
        for i in range(n):
            pre = f"features.{fi}.conv"
            blk = {}
            if t != 1:
                blk["expand"] = {"w": _cw(sd[f"{pre}.0.0.weight"]),
                                 "bn": _bn(sd, f"{pre}.0.1")}
                dwp, pwp, pbn = f"{pre}.1.0", f"{pre}.2", f"{pre}.3"
            else:
                dwp, pwp, pbn = f"{pre}.0.0", f"{pre}.1", f"{pre}.2"
            blk["dw"] = {"w": _cw(sd[f"{dwp}.weight"]),
                         "bn": _bn(sd, dwp.rsplit(".", 1)[0] + "." +
                                   str(int(dwp.rsplit(".", 1)[1]) + 1))}
            blk["project"] = {"w": _cw(sd[f"{pwp}.weight"]),
                              "bn": _bn(sd, pbn)}
            blocks.append(blk)
            fi += 1
    return {
        "stem": {"w": _cw(sd["features.0.0.weight"]),
                 "bn": _bn(sd, "features.0.1")},
        "blocks": blocks,
        "head": {"w": _cw(sd["features.18.0.weight"]),
                 "bn": _bn(sd, "features.18.1")},
        "fc": {"w": np.ascontiguousarray(np.asarray(sd["classifier.1.weight"]).T),
               "b": np.asarray(sd["classifier.1.bias"])},
    }
