"""CubePad: golden parity vs the reference PyTorch op + internal consistency.

Golden fixtures were produced by tools/gen_golden_cube_pad.py running the
reference model/cube_pad.py on random inputs (all 24 neighbour-strip
orientations + 4 corners are exercised by the asymmetric-pad cases).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.ops.cube_pad import (
    build_cube_pad_index_map,
    cube_pad,
    cube_pad_explicit,
    cube_pad_gather,
    get_pad_size,
    zero_pad,
)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "cube_pad.npz"))

CASE_NAMES = sorted({k.rsplit("_", 1)[0] for k in GOLDEN.files if k.endswith("_in")})


def nchw_to_cube_nhwc(x):
    """Reference [6N,C,H,W] -> ours [N,6,H,W,C]."""
    n = x.shape[0] // 6
    x = x.reshape(n, 6, x.shape[1], x.shape[2], x.shape[3])
    return np.transpose(x, (0, 1, 3, 4, 2))


def cube_nhwc_to_nchw(x):
    n, six, h, w, c = x.shape
    return np.transpose(x, (0, 1, 4, 2, 3)).reshape(n * six, c, h, w)


@pytest.mark.parametrize("case", CASE_NAMES)
def test_golden_parity(case):
    x = GOLDEN[f"{case}_in"]
    want = GOLDEN[f"{case}_out"]
    pad = tuple(int(p) for p in GOLDEN[f"{case}_pad"])

    got = cube_pad(jnp.asarray(nchw_to_cube_nhwc(x)), pad)
    got = cube_nhwc_to_nchw(np.asarray(got))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("case", CASE_NAMES)
def test_gather_form_matches_default(case):
    # the gather form is the index-map ground truth; the default (explicit
    # slice/concat, faster on TPU) must match it exactly
    x = nchw_to_cube_nhwc(GOLDEN[f"{case}_in"])
    pad = tuple(int(p) for p in GOLDEN[f"{case}_pad"])
    a = cube_pad(jnp.asarray(x), pad)
    b = cube_pad_gather(jnp.asarray(x), pad)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_interior_is_identity():
    x = np.random.RandomState(1).randn(2, 6, 8, 8, 3).astype(np.float32)
    y = np.asarray(cube_pad(jnp.asarray(x), 2))
    np.testing.assert_array_equal(y[:, :, 2:-2, 2:-2, :], x)


def test_uniform_int_pad_equals_tuple():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 6, 8, 8, 2).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(cube_pad(x, 1)), np.asarray(cube_pad(x, (1, 1, 1, 1)))
    )


def test_pad_zero_is_noop():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 6, 8, 8, 2).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(cube_pad(x, 0)), np.asarray(x))


def test_constant_cube_stays_constant():
    # A sphere with a constant value must pad seamlessly: no seams anywhere.
    x = jnp.full((1, 6, 16, 16, 4), 3.25, dtype=jnp.float32)
    y = np.asarray(cube_pad(x, 3))
    assert (y == 3.25).all()


def test_faceless_rank4_input():
    x = np.random.RandomState(4).randn(6, 8, 8, 3).astype(np.float32)
    a = np.asarray(cube_pad(jnp.asarray(x), 1))
    b = np.asarray(cube_pad(jnp.asarray(x)[None], 1))[0]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (6, 10, 10, 3)


def test_index_map_shape_and_range():
    m = build_cube_pad_index_map(8, 8, (1, 2, 3, 0))
    assert m.shape == (6, 8 + 3 + 0, 8 + 1 + 2)
    assert m.min() >= 0 and m.max() < 6 * 8 * 8


def test_grad_flows():
    x = jnp.asarray(np.random.RandomState(5).randn(1, 6, 4, 4, 2).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(cube_pad(v, 1) ** 2))(x)
    assert g.shape == x.shape
    assert bool(jnp.any(g != 0))


def test_zero_pad():
    x = jnp.asarray(np.random.RandomState(6).randn(1, 6, 4, 4, 2).astype(np.float32))
    y = np.asarray(zero_pad(x, (1, 2, 3, 4)))
    assert y.shape == (1, 6, 4 + 3 + 4, 4 + 1 + 2, 2)
    np.testing.assert_array_equal(y[:, :, 3:-4, 1:-2, :], np.asarray(x))
    assert (y[:, :, :3] == 0).all() and (y[:, :, :, :1] == 0).all()


def test_get_pad_size():
    assert get_pad_size(3) == (3, 3, 3, 3)
    assert get_pad_size([1, 2, 3, 4]) == (1, 2, 3, 4)


def test_cube_pad_max_pool_fused_exact():
    """cube_pad_max_pool_3x3s2 == max_pool(cube_pad(x, 1), 3, 2) bit-exact
    (the stem-pool fusion, models/resnet.py; max is grouping-insensitive so
    no tolerance is needed)."""
    from cp360_tpu.models.layers import max_pool
    from cp360_tpu.ops.cube_pad import cube_pad, cube_pad_max_pool_3x3s2

    rng = np.random.RandomState(3)
    for h, c, dt in ((8, 5, np.float32), (14, 3, np.float32),
                     (16, 4, np.float16)):
        x = jnp.asarray(rng.randn(2, 6, h, h, c).astype(dt))
        want = max_pool(cube_pad(x, 1).reshape(12, h + 2, h + 2, c), 3, 2)
        for form in ("fused2d", "fused2d_dus", "separable", "pairmax"):
            got = cube_pad_max_pool_3x3s2(x, form=form)
            np.testing.assert_array_equal(
                np.asarray(got).reshape(12, h // 2, h // 2, c),
                np.asarray(want), err_msg=form)


def test_halo_strip_sources_bit_equal(monkeypatch):
    """The slice/flip plate halo strips (CP360_HALO_SOURCE=slice, the TPU
    default — short-C-row jnp.take is this libtpu's gather pathology) give
    BIT-identical fused-pool and halo-conv results to the index-map gather
    source."""
    from cp360_tpu.ops import cube_pad as cp

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 6, 14, 14, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    outs = {}
    for src in ("gather", "slice"):
        monkeypatch.setattr(cp, "HALO_SOURCE", src)
        # HALO_SOURCE is trace-time Python: clear the pool's jit cache so
        # each source actually retraces (cube_pad_conv3x3 is unjitted)
        cp.cube_pad_max_pool_3x3s2.clear_cache()
        outs[src] = (np.asarray(cp.cube_pad_max_pool_3x3s2(x)),
                     np.asarray(cp.cube_pad_conv3x3(x, w, form="halo")),
                     np.asarray(cp.cube_pad_conv3x3(x, w, stride=2,
                                                    form="halo")))
    for a, b in zip(outs["gather"], outs["slice"]):
        np.testing.assert_array_equal(a, b)


def test_cube_pad_max_pool_rejects_unknown_form():
    from cp360_tpu.ops.cube_pad import cube_pad_max_pool_3x3s2

    x = jnp.zeros((1, 6, 8, 8, 2), jnp.float32)
    with pytest.raises(ValueError, match="pool form"):
        cube_pad_max_pool_3x3s2(x, form="fussed2d")


def test_cube_pad_conv3x3_halo_matches_pad():
    """The border-correction ('halo') cube conv == conv(cube_pad(x,1)) to
    f32 reassociation error, both strides (ops/cube_pad.py::cube_pad_conv3x3;
    replaces the Bottleneck CubePad(1)+3x3 hot path,
    model/resnet_cubic.py:92-93)."""
    from cp360_tpu.ops.cube_pad import cube_pad_conv3x3

    rng = np.random.RandomState(11)
    for h, cin, cout, stride in ((8, 5, 7, 1), (8, 5, 7, 2),
                                 (14, 3, 4, 1), (16, 4, 6, 2)):
        x = jnp.asarray(rng.randn(2, 6, h, h, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
        want = cube_pad_conv3x3(x, w, stride=stride, form="pad")
        got = cube_pad_conv3x3(x, w, stride=stride, form="halo")
        assert got.shape == want.shape == (2, 6, h // stride, h // stride,
                                           cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"h={h} stride={stride}")


def test_cube_pad_conv3x3_rejects_unknown_form():
    from cp360_tpu.ops.cube_pad import cube_pad_conv3x3

    x = jnp.zeros((1, 6, 8, 8, 2), jnp.float32)
    w = jnp.zeros((3, 3, 2, 2), jnp.float32)
    with pytest.raises(ValueError, match="cube-conv form"):
        cube_pad_conv3x3(x, w, form="hallo")


def test_resnet_halo_conv_form_matches_pad_form():
    """resnet_apply with cube_conv_form='halo' tracks the 'pad' form within
    f32 reassociation tolerance end-to-end (border ring is ~7%% of pixels;
    the f32 parity/golden paths keep 'pad' as the default)."""
    from cp360_tpu.models.resnet import init_resnet_params, resnet_apply

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet50")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 64, 64, 3),
                          jnp.float32)
    _, fp = resnet_apply(params, x, compute_dtype=jnp.float32,
                         with_logits=False, cube_conv_form="pad")
    _, fh = resnet_apply(params, x, compute_dtype=jnp.float32,
                         with_logits=False, cube_conv_form="halo")
    # reassociation compounds through 16 stacked blocks: measured drift is
    # ~2e-4 absolute on ~1e2-magnitude activations (the op-level test above
    # holds the strict 2e-5 single-conv bound)
    np.testing.assert_allclose(np.asarray(fh), np.asarray(fp),
                               rtol=1e-3, atol=1e-3)
