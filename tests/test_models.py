"""Model parity vs the reference nets (goldens from tools/gen_golden_models.py).

The golden state dicts are regenerated here from the stored key/shape
manifest with the same per-key deterministic RNG — identical tensors to what
the reference model ran with — then fed through our torch->params converter.
"""

import os
import zlib

import numpy as np
import pytest
import jax.numpy as jnp

from cp360_tpu.compat.torch_weights import (
    convert_clstm_state_dict,
    convert_resnet_state_dict,
    flatten_params,
    load_npz,
    save_npz,
    unflatten_params,
)
from cp360_tpu.models import (
    cam_forward,
    cam_scores,
    clstm_rollout,
    init_clstm_params,
    init_resnet_params,
    resnet_apply,
)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "models.npz"))


def synth_tensor(key: str, shape):
    rs = np.random.RandomState(zlib.crc32(key.encode()) % (2**31))
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if key.endswith("running_var"):
        return rs.uniform(0.5, 2.0, size=shape).astype(np.float32)
    return (rs.randn(*shape) * 0.05).astype(np.float32)


def rebuild_state_dict(prefix):
    keys = [str(k) for k in GOLDEN[f"{prefix}_keys"]]
    shapes = [tuple(int(d) for d in s.split(",") if d) for s in GOLDEN[f"{prefix}_shapes"]]
    return {k: synth_tensor(k, s) for k, s in zip(keys, shapes)}


@pytest.fixture(scope="module")
def resnet_params():
    return convert_resnet_state_dict(rebuild_state_dict("resnet50"), "resnet50")


def test_resnet50_parity(resnet_params):
    x = GOLDEN["resnet50_in"]  # [6, 3, 224, 224]
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1)[None])  # [1, 6, 224, 224, 3]
    logits, feats = resnet_apply(
        resnet_params, x_nhwc, arch="resnet50", compute_dtype=jnp.float32
    )
    want_logits = GOLDEN["resnet50_logits"]
    want_feats = GOLDEN["resnet50_feats"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(feats), want_feats, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits), want_logits, atol=2e-4, rtol=1e-3)


def test_cam_scores_match_reference_semantics(resnet_params):
    # Reference CAM: shift fc weight non-negative, W · feat per face
    # (class_activation_model.py:46-83).
    feats = GOLDEN["resnet50_feats"].transpose(0, 2, 3, 1)  # [6, 7, 7, 2048]
    w = rebuild_state_dict("resnet50")["fc.weight"]  # [1000, 2048]
    w_shift = w - min(w.min(), 0.0)
    want = np.einsum("kc,bchw->bkhw", w_shift, GOLDEN["resnet50_feats"])
    got = np.asarray(cam_scores(jnp.asarray(feats), resnet_params["fc"]["w"]))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-2, rtol=1e-4)


def test_clstm_parity():
    params = convert_clstm_state_dict(rebuild_state_dict("clstm"))
    seq = GOLDEN["clstm_seq"]  # [3, 6, 8, 7, 7]
    seq_nhwc = jnp.asarray(seq.transpose(0, 1, 3, 4, 2))  # [3, 6, 7, 7, 8]
    h0 = c0 = seq_nhwc[0]
    hs, h, c = clstm_rollout(params, seq_nhwc, h0, c0)
    want_h = GOLDEN["clstm_hiddens"].transpose(0, 1, 3, 4, 2)
    want_c = GOLDEN["clstm_cells"].transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(hs), want_h, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c), want_c[-1], atol=1e-4)


def test_clstm_positional_fallback():
    sd = rebuild_state_dict("clstm")
    renamed = {f"anything.{i}": v for i, v in enumerate(sd.values())}
    a = convert_clstm_state_dict(sd)
    b = convert_clstm_state_dict(renamed)
    for k in a:
        np.testing.assert_array_equal(a[k]["w"], b[k]["w"])


def test_npz_roundtrip(tmp_path):
    params = init_clstm_params(jnp.asarray(np.array([0, 1], np.uint32)).view(), 4, 4)
    # use jax PRNG properly
    import jax

    params = init_clstm_params(jax.random.PRNGKey(0), 4, 4)
    p = tmp_path / "clstm.npz"
    save_npz(str(p), params)
    loaded = load_npz(str(p))
    flat_a = flatten_params(params)
    flat_b = flatten_params(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def test_list_stage_roundtrip():
    import jax

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    rt = unflatten_params(flatten_params(params))
    assert isinstance(rt["layer1"], list) and len(rt["layer1"]) == 2


def test_resnet18_shapes():
    import jax

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    x = jnp.zeros((1, 6, 64, 64, 3))
    _, feats = resnet_apply(
        params, x, arch="resnet18", compute_dtype=jnp.float32, with_logits=False
    )
    assert feats.shape == (6, 2, 2, 512)


def test_zero_pad_path_runs():
    import jax

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet50")
    x = jnp.zeros((1, 6, 64, 64, 3))
    _, feats = resnet_apply(
        params, x, arch="resnet50", use_cube_pad=False,
        compute_dtype=jnp.float32, with_logits=False,
    )
    assert feats.shape == (6, 2, 2, 2048)


def test_cam_forward_nonneg_scores(resnet_params):
    x = jnp.asarray(GOLDEN["resnet50_in"].transpose(0, 2, 3, 1)[None]) * 0.0
    scores, feats = cam_forward(resnet_params, x, compute_dtype=jnp.bfloat16)
    assert scores.shape == (1, 6, 7, 7, 1000)
    assert feats.shape == (1, 6, 7, 7, 2048)
    assert bool(jnp.all(scores >= -1e-3))  # non-negative-shifted weights


def test_fold_batch_norm_into_conv_exact():
    """Folded (w', b') reproduces conv2d -> batch_norm on f32 inputs."""
    from cp360_tpu.models.layers import (
        batch_norm, bn_params, conv2d, fold_batch_norm_into_conv,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32) * 0.1)
    bn = bn_params(5)
    bn = {
        "scale": jnp.asarray(rng.rand(5).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(5).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(5).astype(np.float32)),
        "var": jnp.asarray(rng.rand(5).astype(np.float32) + 0.1),
    }
    ref = batch_norm(conv2d(x, w, padding="SAME"), bn)
    wf, bf = fold_batch_norm_into_conv(w, bn)
    out = conv2d(x, wf, bf, padding="SAME")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_stem_space_to_depth_matches_plain_stem(resnet_params):
    """The s2d stem (4x4/s1 conv on 2x2 parity-split input) reproduces the
    7x7/s2 stem through the whole backbone — exact math, reordered sums
    (kept opt-in: measured slower on this libtpu, see resnet_apply)."""
    import numpy as np

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 32, 32, 3).astype(np.float32))
    a = resnet_apply(resnet_params, x, compute_dtype=jnp.float32,
                     with_logits=False, stem_s2d=True)[1]
    b = resnet_apply(resnet_params, x, compute_dtype=jnp.float32,
                     with_logits=False, stem_s2d=False)[1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-4, rtol=1e-3)
