"""Fused cube-padded conv kernel vs the gather+conv oracle (interpret mode
on CPU; the real-chip run happens in bench/drive)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.ops.pallas_kernels import (
    build_selection_matrix,
    cube_conv3x3,
    cube_conv3x3_reference,
)


def test_selection_matrix_structure():
    a = build_selection_matrix(7, 7)
    assert a.shape == (9 * 294, 294)
    # exactly one source per (tap, position)
    np.testing.assert_array_equal(a.sum(1), np.ones(9 * 294))
    # the center tap (k=4) is the identity permutation
    center = a.reshape(9, 294, 294)[4]
    np.testing.assert_array_equal(center, np.eye(294))


@pytest.mark.parametrize("cin,cout,ci_t,co_t", [(16, 24, 16, 8), (40, 16, 16, 16)])
def test_fused_matches_reference(cin, cout, ci_t, co_t):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 7, 7, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))

    want = np.asarray(cube_conv3x3_reference(x, w, b))
    got = np.asarray(cube_conv3x3(x, w, b, ci_tile=ci_t, co_tile=co_t, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_matches_reference_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 7, 7, 32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 32, 16) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.randn(16), jnp.bfloat16)
    want = np.asarray(cube_conv3x3_reference(x, w, b).astype(jnp.float32))
    got = np.asarray(
        cube_conv3x3(x, w, b, ci_tile=32, co_tile=16, interpret=True).astype(jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)


def test_channel_padding_path():
    # cin/cout not multiples of the tiles -> zero-padded internally
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 7, 7, 20).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 20, 12).astype(np.float32) * 0.1)
    b = jnp.asarray(np.zeros(12, np.float32))
    want = np.asarray(cube_conv3x3_reference(x, w, b))
    got = np.asarray(cube_conv3x3(x, w, b, ci_tile=16, co_tile=8, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
