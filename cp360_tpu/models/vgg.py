"""Cube-padded VGG16-BN backbone + CAM head.

The reference gestures at VGG16 support but ships it commented out
("Currently support ResNet-50 only", static_model/dataset_feat_extractor.py:
50-52,164-167, with a CAM('camconv', 'classifier.weight') call shape).  This
is a working implementation of that surface:

- VGG16-BN features with every 3x3 conv preceded by cube padding (VALID),
  2x2/s2 max pools (224 faces -> 7x7x512);
- a CAM-style head in the GAP-CAM formulation the reference's call implies:
  ``camconv`` (cube-padded 3x3, 512 -> 1024) -> global average pool ->
  ``classifier`` linear 1024 -> num_classes, so per-face score maps are
  ``einsum(classifier_w, camconv_features)`` exactly like the ResNet path.

Converter accepts torchvision ``vgg16_bn`` state dicts for the features
(sequential index layout); the camconv/classifier head has no torchvision
counterpart and trains (or loads) separately.
"""

from __future__ import annotations

from functools import partial
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.models import layers

# VGG-16 configuration "D": conv widths with 'M' pool markers.
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


def _pad(x: jax.Array, use_cp: bool) -> jax.Array:
    return layers.pad_faces(x, 1, use_cp)


def init_vgg16_params(key: jax.Array, num_classes: int = 1000,
                      cam_channels: int = 1024, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 20))
    convs = []
    cin = 3
    for v in _VGG16_CFG:
        if v == "M":
            continue
        convs.append(
            {
                "w": layers.he_conv(next(keys), 3, 3, cin, v, dtype),
                "b": jnp.zeros((v,), dtype),
                "bn": layers.bn_params(v, dtype),
            }
        )
        cin = v
    k1, k2 = next(keys), next(keys)
    return {
        "features": convs,
        "camconv": {
            "w": layers.he_conv(k1, 3, 3, cin, cam_channels, dtype),
            "b": jnp.zeros((cam_channels,), dtype),
        },
        "classifier": {
            "w": jax.random.normal(k2, (cam_channels, num_classes), dtype) * 0.01,
            "b": jnp.zeros((num_classes,), dtype),
        },
    }


@partial(jax.jit, static_argnames=("use_cube_pad", "compute_dtype", "with_logits"))
def vgg16_apply(
    params: dict,
    x: jax.Array,
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    with_logits: bool = True,
):
    """Forward: [N, 6, H, W, 3] (or [N*6, H, W, 3]) -> (logits, camconv feats)."""
    if x.ndim == 5:
        x = x.reshape(-1, *x.shape[2:])
    if compute_dtype is not None:
        # one entry cast keeps the whole trunk in compute dtype (see
        # resnet_apply — halves elementwise HBM traffic under bf16)
        x = x.astype(compute_dtype)
    out = x
    ci = 0
    for v in _VGG16_CFG:
        if v == "M":
            out = layers.max_pool(out, 2, 2)
            continue
        p = params["features"][ci]
        out = layers.conv2d(_pad(out, use_cube_pad), p["w"], p["b"], compute_dtype=compute_dtype)
        out = layers.batch_norm(out, p["bn"])
        out = jax.nn.relu(out)
        ci += 1

    p = params["camconv"]
    feats = layers.conv2d(_pad(out, use_cube_pad), p["w"], p["b"], compute_dtype=compute_dtype)
    feats = jax.nn.relu(feats)

    if not with_logits:
        return None, feats
    pooled = jnp.mean(feats, axis=(1, 2))
    logits = layers.linear(pooled, params["classifier"])
    return logits, feats


@partial(jax.jit, static_argnames=("use_cube_pad", "compute_dtype"))
def vgg16_cam_forward(params: dict, cubes: jax.Array,
                      use_cube_pad: bool = True, compute_dtype=jnp.bfloat16):
    """Cube faces [N, 6, H, W, 3] -> (CAM score cube, camconv feats)."""
    from cp360_tpu.models.cam import cam_scores

    n = cubes.shape[0]
    _, feats = vgg16_apply(
        params, cubes, use_cube_pad=use_cube_pad,
        compute_dtype=compute_dtype, with_logits=False,
    )
    scores = cam_scores(feats, params["classifier"]["w"])
    h, w = feats.shape[1:3]
    return scores.reshape(n, 6, h, w, -1), feats.reshape(n, 6, h, w, -1)


def convert_vgg16_bn_features(sd: Mapping[str, np.ndarray], params: dict) -> dict:
    """Merge torchvision ``vgg16_bn`` feature weights into our params.

    torchvision layout: features.{i}.weight/bias alternating Conv2d and
    BatchNorm2d with ReLU/MaxPool gaps.  The camconv/classifier head is left
    untouched (no torchvision counterpart).
    """
    out = {**params, "features": [dict(f) for f in params["features"]]}
    seq_i = 0
    conv_i = 0
    for v in _VGG16_CFG:
        if v == "M":
            seq_i += 1
            continue
        conv_w = np.asarray(sd[f"features.{seq_i}.weight"]).transpose(2, 3, 1, 0)
        conv_b = np.asarray(sd[f"features.{seq_i}.bias"])
        bn = {
            "scale": np.asarray(sd[f"features.{seq_i + 1}.weight"]),
            "bias": np.asarray(sd[f"features.{seq_i + 1}.bias"]),
            "mean": np.asarray(sd[f"features.{seq_i + 1}.running_mean"]),
            "var": np.asarray(sd[f"features.{seq_i + 1}.running_var"]),
        }
        out["features"][conv_i] = {"w": conv_w, "b": conv_b, "bn": bn}
        conv_i += 1
        seq_i += 3  # Conv2d, BatchNorm2d, ReLU
    return out
