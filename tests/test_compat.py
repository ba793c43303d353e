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


def test_convert_pth_unknown_kind(tmp_path):
    import torch

    pth = str(tmp_path / "x.pth")
    torch.save({}, pth)
    with pytest.raises(ValueError, match="unknown kind"):
        convert_pth(pth, str(tmp_path / "x.npz"), kind="nope")
