"""Cube-padded VGG16-BN backbone (the surface the reference comments out)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.models.vgg import (
    convert_vgg16_bn_features,
    init_vgg16_params,
    vgg16_apply,
    vgg16_cam_forward,
)


@pytest.fixture(scope="module")
def params():
    return init_vgg16_params(jax.random.PRNGKey(0))


def test_shapes(params):
    x = jnp.zeros((1, 6, 64, 64, 3))
    logits, feats = vgg16_apply(params, x, compute_dtype=jnp.float32)
    assert logits.shape == (6, 1000)
    assert feats.shape == (6, 2, 2, 1024)  # 64px faces -> 2x2 after 5 pools


def test_cam_forward(params):
    x = jnp.zeros((2, 6, 64, 64, 3))
    scores, feats = vgg16_cam_forward(params, x, compute_dtype=jnp.float32)
    assert scores.shape == (2, 6, 2, 2, 1000)
    assert bool(jnp.all(scores >= -1e-5))


def test_constant_sphere_is_seamless(params):
    # with cube padding, a constant-color sphere must produce identical
    # feature maps on all 6 faces
    x = jnp.full((1, 6, 64, 64, 3), 0.3)
    _, feats = vgg16_apply(params, x, compute_dtype=jnp.float32, with_logits=False)
    f = np.asarray(feats)
    for face in range(1, 6):
        np.testing.assert_allclose(f[face], f[0], atol=1e-4)


def test_zero_pad_breaks_seamlessness(params):
    x = jnp.full((1, 6, 64, 64, 3), 0.3)
    _, cp_feats = vgg16_apply(params, x, compute_dtype=jnp.float32, with_logits=False)
    _, zp_feats = vgg16_apply(
        params, x, use_cube_pad=False, compute_dtype=jnp.float32, with_logits=False
    )
    # zero padding introduces border artifacts -> interior != border
    z = np.asarray(zp_feats[0])
    assert np.abs(z[0, 0] - z[1, 1]).max() > 1e-3
    c = np.asarray(cp_feats[0])
    assert np.abs(c[0, 0] - c[1, 1]).max() < 1e-4


def test_torchvision_layout_converter(params):
    # synthesize a state dict with torchvision vgg16_bn's sequential naming
    import torch
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    mods, cin = [], 3
    for v in cfg:
        if v == "M":
            mods.append(nn.MaxPool2d(2, 2))
        else:
            mods += [nn.Conv2d(cin, v, 3, padding=1), nn.BatchNorm2d(v), nn.ReLU()]
            cin = v
    torch.manual_seed(0)
    features = nn.Sequential(*mods)
    sd = {f"features.{k}": v.numpy() for k, v in features.state_dict().items()}

    merged = convert_vgg16_bn_features(sd, params)
    # first conv weights must match the torch tensor (transposed to HWIO)
    want = sd["features.0.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(merged["features"][0]["w"]), want)
    assert len(merged["features"]) == 13
    # head untouched
    np.testing.assert_array_equal(
        np.asarray(merged["classifier"]["w"]), np.asarray(params["classifier"]["w"])
    )
    # merged params still run
    _, feats = vgg16_apply(merged, jnp.zeros((1, 6, 32, 32, 3)), compute_dtype=jnp.float32, with_logits=False)
    assert feats.shape == (6, 1, 1, 1024)
