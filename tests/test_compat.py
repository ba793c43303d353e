"""Weight-compat helpers: tolerant merge, NCHW wrapper, pth conversion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.compat.torch_weights import (
    convert_clstm_state_dict,
    convert_pth,
    load_npz,
    merge_pretrained_tolerant,
)
from cp360_tpu.models.clstm import init_clstm_params
from cp360_tpu.ops.cube_pad import cube_pad, cube_pad_nchw


def test_merge_pretrained_tolerant():
    init = jax.device_get(init_clstm_params(jax.random.PRNGKey(0), 4, 4))
    donor = jax.device_get(init_clstm_params(jax.random.PRNGKey(1), 4, 4))
    # corrupt one donor leaf's shape and add an unexpected key
    donor_flat = {
        "conv1": {"w": np.asarray(donor["conv1"]["w"]), "b": np.zeros((999,))},
        "conv2": donor["conv2"],
        "gates": donor["gates"],
        "extra": {"w": np.zeros((1,))},
    }
    logs = []
    merged = merge_pretrained_tolerant(init, donor_flat, log_fn=logs.append)
    # matching leaves copied
    np.testing.assert_array_equal(
        np.asarray(merged["conv2"]["w"]), np.asarray(donor["conv2"]["w"])
    )
    # mismatched leaf kept from init, logged
    np.testing.assert_array_equal(
        np.asarray(merged["conv1"]["b"]), np.asarray(init["conv1"]["b"])
    )
    assert any("inconsistent size" in m for m in logs)
    assert any("unexpected key" in m for m in logs)


def test_cube_pad_nchw_matches_nhwc():
    rng = np.random.RandomState(0)
    x = rng.randn(12, 3, 8, 8).astype(np.float32)  # two cubes, ref layout
    got = np.asarray(cube_pad_nchw(jnp.asarray(x), 2))
    x5 = jnp.asarray(np.transpose(x.reshape(2, 6, 3, 8, 8), (0, 1, 3, 4, 2)))
    want = np.asarray(cube_pad(x5, 2))
    want = np.transpose(want, (0, 1, 4, 2, 3)).reshape(12, 3, 12, 12)
    np.testing.assert_array_equal(got, want)
    with pytest.raises(AssertionError):
        cube_pad_nchw(jnp.zeros((5, 3, 8, 8)), 1)


def test_convert_pth_roundtrip(tmp_path):
    import torch

    sd = {
        "Conv1.weight": torch.randn(16, 8, 3, 3),
        "Conv1.bias": torch.randn(16),
        "Conv2.weight": torch.randn(16, 16, 3, 3),
        "Conv2.bias": torch.randn(16),
        "Gates.weight": torch.randn(16, 16, 3, 3),
        "Gates.bias": torch.randn(16),
    }
    pth = str(tmp_path / "c.pth")
    torch.save(sd, pth)
    out = str(tmp_path / "c.npz")
    convert_pth(pth, out, kind="clstm")
    params = load_npz(out)
    want = convert_clstm_state_dict({k: v.numpy() for k, v in sd.items()})
    for name in ("conv1", "conv2", "gates"):
        np.testing.assert_array_equal(params[name]["w"], want[name]["w"])
        np.testing.assert_array_equal(params[name]["b"], want[name]["b"])


def test_convert_weights_cli_auto_kinds(tmp_path):
    """cp360-convert sniffs the family and round-trips both checkpoint kinds."""
    import torch

    from cp360_tpu.cli.convert_weights import main as convert_main, sniff_kind
    from cp360_tpu.compat.torch_weights import convert_resnet_state_dict
    from cp360_tpu.models.resnet import init_resnet_params

    # CLSTM: reference key names (model/clstm.py:28-34)
    sd = {
        "Conv1.weight": torch.randn(4, 2, 3, 3),
        "Conv1.bias": torch.randn(4),
        "Conv2.weight": torch.randn(4, 4, 3, 3),
        "Conv2.bias": torch.randn(4),
        "Gates.weight": torch.randn(16, 8, 3, 3),
        "Gates.bias": torch.randn(16),
    }
    pth = str(tmp_path / "clstm.pth")
    torch.save(sd, pth)
    out = str(tmp_path / "clstm.npz")
    assert convert_main([pth, out]) == 0  # --kind auto is the default
    params = load_npz(out)
    want = convert_clstm_state_dict({k: v.numpy() for k, v in sd.items()})
    np.testing.assert_array_equal(params["gates"]["w"], want["gates"]["w"])

    # ResNet: a full torchvision-style resnet18 state dict (basic blocks,
    # downsample conv at the first block of layers 2-4)
    def bn(pre, c):
        return {
            f"{pre}.weight": torch.randn(c), f"{pre}.bias": torch.randn(c),
            f"{pre}.running_mean": torch.randn(c),
            f"{pre}.running_var": torch.rand(c) + 0.5,
        }

    tsd = {"conv1.weight": torch.randn(64, 3, 7, 7), **bn("bn1", 64)}
    cin = 64
    for li, cout in enumerate([64, 128, 256, 512]):
        for bi in range(2):
            pre = f"layer{li + 1}.{bi}"
            c1_in = cin if bi == 0 else cout
            tsd[f"{pre}.conv1.weight"] = torch.randn(cout, c1_in, 3, 3)
            tsd.update(bn(f"{pre}.bn1", cout))
            tsd[f"{pre}.conv2.weight"] = torch.randn(cout, cout, 3, 3)
            tsd.update(bn(f"{pre}.bn2", cout))
            if bi == 0 and cin != cout:
                tsd[f"{pre}.downsample.0.weight"] = torch.randn(cout, cin, 1, 1)
                tsd.update(bn(f"{pre}.downsample.1", cout))
        cin = cout
    tsd["fc.weight"] = torch.randn(1000, 512)
    tsd["fc.bias"] = torch.randn(1000)
    assert sniff_kind(tsd.keys()) == "resnet"
    pth2 = str(tmp_path / "rn.pth")
    torch.save(tsd, pth2)
    out2 = str(tmp_path / "rn.npz")
    assert convert_main([pth2, out2, "--arch", "resnet18"]) == 0
    got = load_npz(out2)
    want2 = convert_resnet_state_dict(
        {k: v.numpy() for k, v in tsd.items()}, "resnet18")
    np.testing.assert_array_equal(
        np.asarray(got["conv1"]["w"]), np.asarray(want2["conv1"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(got["fc"]["w"]), np.asarray(want2["fc"]["w"]))
    # the converted tree merges cleanly into a real init (shape-compatible)
    init = jax.device_get(init_resnet_params(jax.random.PRNGKey(0), "resnet18"))
    logs = []
    merge_pretrained_tolerant(init, got, log_fn=logs.append)
    assert not any("inconsistent size" in m for m in logs), logs


def test_convert_pth_unknown_kind(tmp_path):
    import torch

    pth = str(tmp_path / "x.pth")
    torch.save({}, pth)
    with pytest.raises(ValueError, match="unknown kind"):
        convert_pth(pth, str(tmp_path / "x.npz"), kind="nope")


def test_export_clstm_exact_inverse(tmp_path):
    """export_clstm_state_dict is the exact inverse of the converter and
    emits the reference's own key names (model/clstm.py:28-34)."""
    from cp360_tpu.compat.torch_weights import (
        export_clstm_state_dict,
        export_pth,
        save_npz,
    )

    params = jax.device_get(init_clstm_params(jax.random.PRNGKey(3), 6, 10))
    sd = export_clstm_state_dict(params)
    assert set(sd.keys()) == {
        "Conv1.weight", "Conv1.bias", "Conv2.weight", "Conv2.bias",
        "Gates.weight", "Gates.bias",
    }
    back = convert_clstm_state_dict(sd)
    for name in ("conv1", "conv2", "gates"):
        np.testing.assert_array_equal(
            np.asarray(back[name]["w"]), np.asarray(params[name]["w"]))
        np.testing.assert_array_equal(
            np.asarray(back[name]["b"]), np.asarray(params[name]["b"]))
    # torch layout restored: OIHW, gates 4*hidden in and out
    assert sd["Gates.weight"].shape == (4 * 10, 4 * 10, 3, 3)

    # .pth written by export_pth torch.load()s the way the reference driver
    # does (temporal_model/test_temporal.py:147-150) and converts back exactly
    import torch

    npz = str(tmp_path / "c.npz")
    pth = str(tmp_path / "c.pth")
    save_npz(npz, params)
    export_pth(npz, pth, kind="clstm")
    loaded = torch.load(pth, map_location="cpu", weights_only=False)
    back2 = convert_clstm_state_dict({k: v.numpy() for k, v in loaded.items()})
    np.testing.assert_array_equal(
        np.asarray(back2["gates"]["w"]), np.asarray(params["gates"]["w"]))


def test_export_resnet_roundtrip_torchvision_keys():
    """torch sd -> convert -> export reproduces every original tensor and the
    torchvision buffer set (strict-loadable into a stock resnet)."""
    import torch

    from cp360_tpu.compat.torch_weights import (
        convert_resnet_state_dict,
        export_resnet_state_dict,
    )

    g = torch.Generator().manual_seed(0)

    def bn(pre, c):
        return {
            f"{pre}.weight": torch.randn(c, generator=g),
            f"{pre}.bias": torch.randn(c, generator=g),
            f"{pre}.running_mean": torch.randn(c, generator=g),
            f"{pre}.running_var": torch.rand(c, generator=g) + 0.5,
        }

    tsd = {"conv1.weight": torch.randn(64, 3, 7, 7, generator=g), **bn("bn1", 64)}
    cin = 64
    for li, cout in enumerate([64, 128, 256, 512]):
        for bi in range(2):
            pre = f"layer{li + 1}.{bi}"
            c1_in = cin if bi == 0 else cout
            tsd[f"{pre}.conv1.weight"] = torch.randn(cout, c1_in, 3, 3, generator=g)
            tsd.update(bn(f"{pre}.bn1", cout))
            tsd[f"{pre}.conv2.weight"] = torch.randn(cout, cout, 3, 3, generator=g)
            tsd.update(bn(f"{pre}.bn2", cout))
            if bi == 0 and cin != cout:
                tsd[f"{pre}.downsample.0.weight"] = torch.randn(
                    cout, cin, 1, 1, generator=g)
                tsd.update(bn(f"{pre}.downsample.1", cout))
        cin = cout
    tsd["fc.weight"] = torch.randn(1000, 512, generator=g)
    tsd["fc.bias"] = torch.randn(1000, generator=g)

    nsd = {k: v.numpy() for k, v in tsd.items()}
    params = convert_resnet_state_dict(nsd, "resnet18")
    out = export_resnet_state_dict(params, "resnet18")
    # every original tensor reproduced exactly
    for k, v in nsd.items():
        np.testing.assert_array_equal(np.asarray(out[k]), v, err_msg=k)
    # the only extra keys are the BN bookkeeping buffers torchvision expects
    extra = set(out) - set(nsd)
    assert extra and all(k.endswith("num_batches_tracked") for k in extra)


def test_convert_weights_cli_export(tmp_path):
    """cp360-convert infers the export direction from a .npz input and
    sniffs the family from the flat key paths."""
    import torch

    from cp360_tpu.cli.convert_weights import main as convert_main
    from cp360_tpu.compat.torch_weights import save_npz

    params = jax.device_get(init_clstm_params(jax.random.PRNGKey(7), 4, 8))
    npz = str(tmp_path / "trained.npz")
    save_npz(npz, params)
    pth = str(tmp_path / "for_reference.pth")
    assert convert_main([npz, pth]) == 0  # auto: sniffs clstm, exports
    loaded = torch.load(pth, map_location="cpu", weights_only=False)
    assert set(loaded.keys()) == {
        "Conv1.weight", "Conv1.bias", "Conv2.weight", "Conv2.bias",
        "Gates.weight", "Gates.bias",
    }
    back = convert_clstm_state_dict({k: v.numpy() for k, v in loaded.items()})
    np.testing.assert_array_equal(
        np.asarray(back["conv1"]["w"]), np.asarray(params["conv1"]["w"]))

    # npz -> npz is a usage error, not a crash
    assert convert_main([npz, str(tmp_path / "x.npz")]) == 2


def test_convert_weights_cli_rejects_pth_to_pth(tmp_path, capsys):
    """Direction follows the extensions: a .pth input means IMPORT, whose
    output is .npz — np.savez would silently append .npz to any other name,
    so the CLI refuses instead of writing a file the user didn't name."""
    import torch

    from cp360_tpu.cli.convert_weights import main as convert_main

    sd = {"Conv1.weight": torch.randn(4, 2, 3, 3),
          "Conv1.bias": torch.randn(4),
          "Conv2.weight": torch.randn(4, 4, 3, 3),
          "Conv2.bias": torch.randn(4),
          "Gates.weight": torch.randn(16, 8, 3, 3),
          "Gates.bias": torch.randn(16)}
    pth = str(tmp_path / "clstm.pth")
    torch.save(sd, pth)
    assert convert_main([pth, str(tmp_path / "out.pth")]) == 2
    assert not (tmp_path / "out.pth").exists()
    assert not (tmp_path / "out.pth.npz").exists()
