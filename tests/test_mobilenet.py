"""Cube-padded MobileNetV2 backbone (depthwise convs through CubePad)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.models.mobilenet import (
    _V2_CFG,
    convert_mobilenet_v2,
    init_mobilenet_v2_params,
    mobilenet_v2_apply,
    mobilenet_v2_cam_forward,
)


@pytest.fixture(scope="module")
def params():
    return init_mobilenet_v2_params(jax.random.PRNGKey(0))


def test_shapes(params):
    x = jnp.zeros((1, 6, 64, 64, 3))
    logits, feats = mobilenet_v2_apply(params, x, compute_dtype=jnp.float32)
    assert logits.shape == (6, 1000)
    assert feats.shape == (6, 2, 2, 1280)  # 64px faces -> 2x2 (5 stride-2s)


def test_cam_forward(params):
    x = jnp.zeros((2, 6, 64, 64, 3))
    scores, feats = mobilenet_v2_cam_forward(params, x, compute_dtype=jnp.float32)
    assert scores.shape == (2, 6, 2, 2, 1000)
    assert feats.shape == (2, 6, 2, 2, 1280)
    assert bool(jnp.all(scores >= -1e-6))  # non-negative-shifted CAM weights


def test_constant_sphere_is_seamless(params):
    # every 3x3 (stem + all depthwise) runs behind cube padding, so a
    # constant-color sphere produces identical feature maps on all faces
    x = jnp.full((1, 6, 64, 64, 3), 0.3)
    _, feats = mobilenet_v2_apply(params, x, compute_dtype=jnp.float32,
                                  with_logits=False)
    f = np.asarray(feats)
    for face in range(1, 6):
        np.testing.assert_allclose(f[face], f[0], atol=1e-4)


def test_zero_pad_breaks_seamlessness(params):
    x = jnp.full((1, 6, 64, 64, 3), 0.3)
    _, cp_feats = mobilenet_v2_apply(params, x, compute_dtype=jnp.float32,
                                     with_logits=False)
    _, zp_feats = mobilenet_v2_apply(params, x, use_cube_pad=False,
                                     compute_dtype=jnp.float32, with_logits=False)
    z = np.asarray(zp_feats[0])
    assert np.abs(z[0, 0] - z[1, 1]).max() > 1e-4
    c = np.asarray(cp_feats[0])
    assert np.abs(c[0, 0] - c[1, 1]).max() < 1e-4


def test_torchvision_layout_converter(params):
    """Synthesized torchvision mobilenet_v2 state dict converts into
    shape-identical params (leaf-for-leaf vs init)."""
    import torch

    from cp360_tpu.compat.torch_weights import flatten_params

    g = torch.Generator().manual_seed(0)

    def bn(pre, c):
        return {f"{pre}.weight": torch.randn(c, generator=g),
                f"{pre}.bias": torch.randn(c, generator=g),
                f"{pre}.running_mean": torch.randn(c, generator=g),
                f"{pre}.running_var": torch.rand(c, generator=g) + 0.5}

    sd = {"features.0.0.weight": torch.randn(32, 3, 3, 3, generator=g),
          **bn("features.0.1", 32)}
    cin, fi = 32, 1
    for t, c, n, s in _V2_CFG:
        for i in range(n):
            hidden = cin * t
            pre = f"features.{fi}.conv"
            if t != 1:
                sd[f"{pre}.0.0.weight"] = torch.randn(hidden, cin, 1, 1, generator=g)
                sd.update(bn(f"{pre}.0.1", hidden))
                dwp, pwp, pbn = f"{pre}.1.0", f"{pre}.2", f"{pre}.3"
                sd[f"{dwp}.weight"] = torch.randn(hidden, 1, 3, 3, generator=g)
                sd.update(bn(f"{pre}.1.1", hidden))
            else:
                dwp, pwp, pbn = f"{pre}.0.0", f"{pre}.1", f"{pre}.2"
                sd[f"{dwp}.weight"] = torch.randn(hidden, 1, 3, 3, generator=g)
                sd.update(bn(f"{pre}.0.1", hidden))
            sd[f"{pwp}.weight"] = torch.randn(c, hidden, 1, 1, generator=g)
            sd.update(bn(pbn, c))
            cin, fi = c, fi + 1
    sd["features.18.0.weight"] = torch.randn(1280, cin, 1, 1, generator=g)
    sd.update(bn("features.18.1", 1280))
    sd["classifier.1.weight"] = torch.randn(1000, 1280, generator=g)
    sd["classifier.1.bias"] = torch.randn(1000, generator=g)

    conv = convert_mobilenet_v2({k: v.numpy() for k, v in sd.items()})
    fc, fi2 = flatten_params(conv), flatten_params(jax.device_get(params))
    assert set(fc) == set(fi2)
    for k in fc:
        assert fc[k].shape == fi2[k].shape, k
    # spot-check exact tensor routing (dw of the first t=6 block)
    np.testing.assert_array_equal(
        fc["blocks/1/dw/w"],
        sd["features.2.conv.1.0.weight"].numpy().transpose(2, 3, 1, 0))
    # converted params run
    x = jnp.zeros((1, 6, 64, 64, 3))
    logits, _ = mobilenet_v2_apply(conv, x, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()


def test_extraction_pipeline_dispatch(params, tmp_path):
    """stage1_batch_faces runs the mobilenet_v2 arch end-to-end."""
    from cp360_tpu.pipelines.extract import stage1_batch_faces

    faces = (np.random.RandomState(0).rand(2, 6, 64, 64, 3) * 255).astype(np.uint8)
    scores, sal = stage1_batch_faces(
        params, jnp.asarray(faces), arch="mobilenet_v2",
        compute_dtype=jnp.float32)
    assert scores.shape == (2, 6, 2, 2, 1000)
    assert sal.shape == (2, 4, 8) and np.isfinite(np.asarray(sal)).all()


def test_convert_cli_sniffs_mobilenet(tmp_path, params):
    """cp360-convert auto-detects the torchvision mobilenet_v2 layout."""
    import torch

    from cp360_tpu.cli.convert_weights import main as convert_main, sniff_kind
    from cp360_tpu.compat.torch_weights import export_clstm_state_dict  # noqa: F401
    from cp360_tpu.compat.torch_weights import flatten_params, load_npz

    # reuse the synthetic sd builder by converting init params' shapes
    flat = flatten_params(jax.device_get(params))
    sd = {}
    # minimal faithful keys: rebuild from our params via the inverse layout
    # (enough for sniffing + conversion round-trip of shapes)
    from cp360_tpu.models.mobilenet import _V2_CFG

    def t(a):
        return torch.from_numpy(np.array(np.asarray(a).transpose(3, 2, 0, 1)))

    def bn(pre, b):
        # .copy(): device_get leaves are read-only buffers; torch warns
        sd[f"{pre}.weight"] = torch.from_numpy(np.array(b["scale"]))
        sd[f"{pre}.bias"] = torch.from_numpy(np.array(b["bias"]))
        sd[f"{pre}.running_mean"] = torch.from_numpy(np.array(b["mean"]))
        sd[f"{pre}.running_var"] = torch.from_numpy(np.array(b["var"]))

    pr = jax.device_get(params)
    sd["features.0.0.weight"] = t(pr["stem"]["w"])
    bn("features.0.1", pr["stem"]["bn"])
    fi = 1
    bi = 0
    for tt, c, n, s in _V2_CFG:
        for i in range(n):
            blk = pr["blocks"][bi]
            pre = f"features.{fi}.conv"
            if tt != 1:
                sd[f"{pre}.0.0.weight"] = t(blk["expand"]["w"])
                bn(f"{pre}.0.1", blk["expand"]["bn"])
                sd[f"{pre}.1.0.weight"] = t(blk["dw"]["w"])
                bn(f"{pre}.1.1", blk["dw"]["bn"])
                sd[f"{pre}.2.weight"] = t(blk["project"]["w"])
                bn(f"{pre}.3", blk["project"]["bn"])
            else:
                sd[f"{pre}.0.0.weight"] = t(blk["dw"]["w"])
                bn(f"{pre}.0.1", blk["dw"]["bn"])
                sd[f"{pre}.1.weight"] = t(blk["project"]["w"])
                bn(f"{pre}.2", blk["project"]["bn"])
            fi += 1
            bi += 1
    sd["features.18.0.weight"] = t(pr["head"]["w"])
    bn("features.18.1", pr["head"]["bn"])
    sd["classifier.1.weight"] = torch.from_numpy(np.array(np.asarray(pr["fc"]["w"]).T))
    sd["classifier.1.bias"] = torch.from_numpy(np.array(pr["fc"]["b"]))

    assert sniff_kind(sd.keys()) == "mobilenet_v2"
    pth = str(tmp_path / "mnv2.pth")
    torch.save(sd, pth)
    out = str(tmp_path / "mnv2.npz")
    assert convert_main([pth, out]) == 0
    got = flatten_params(load_npz(out))
    for k, v in flat.items():
        np.testing.assert_array_equal(got[k], np.asarray(v), err_msg=k)
    # export back to .pth is a clean refusal for this family
    assert convert_main([out, str(tmp_path / "back.pth")]) == 2
