"""Fused cube-padded conv kernel vs the gather+conv oracle (interpret mode
on CPU; the real-chip run happens in bench/drive)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.ops.pallas_kernels import (
    build_scatter_matrix,
    build_selection_matrix,
    cube_conv3x3,
    cube_conv3x3_reference,
    cube_conv3x3_train,
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


def test_scatter_matrix_is_transpose():
    """B2 is the column-restacked transpose of A2: applying gather then
    scatter composes to sum_k A_k^T A_k (each input counted once per tap
    that reads it)."""
    rows = 294
    a = build_selection_matrix(7, 7).reshape(9, rows, rows)
    b2 = build_scatter_matrix(7, 7).reshape(rows, 9, rows)
    for k in range(9):
        np.testing.assert_array_equal(b2[:, k, :], a[k].T)


def test_custom_vjp_matches_autodiff():
    """cube_conv3x3_train's hand-built VJP (Pallas dx + einsum dw/db) equals
    jax autodiff of the gather+conv oracle."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 7, 7, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 6, 7, 7, 8).astype(np.float32))

    def f_ref(x, w, b):
        return jnp.sum(cube_conv3x3_reference(x, w, b) * g)

    def f_pal(x, w, b):
        return jnp.sum(cube_conv3x3_train(x, w, b, True) * g)

    want = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    got = jax.grad(f_pal, argnums=(0, 1, 2))(x, w, b)
    for name, gw, gg in zip(("dx", "dw", "db"), want, got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=2e-3, rtol=2e-3, err_msg=name)


def test_custom_vjp_forward_matches():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 6, 7, 7, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    want = np.asarray(cube_conv3x3_reference(x, w, b))
    got = np.asarray(cube_conv3x3_train(x, w, b, True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_clstm_conv_impl_gate_matches():
    """clstm_rollout(conv_impl='pallas') == conv_impl='xla' (the config
    gate swaps the conv executor only; interpret-mode off TPU)."""
    from cp360_tpu.models.clstm import clstm_rollout, init_clstm_params

    rng = np.random.RandomState(5)
    params = init_clstm_params(jax.random.PRNGKey(0), 8, 8)
    seq = jnp.asarray(rng.rand(3, 2 * 6, 7, 7, 8).astype(np.float32))
    h0 = c0 = seq[0]
    want, _, _ = clstm_rollout(params, seq, h0, c0, conv_impl="xla")
    got, _, _ = clstm_rollout(params, seq, h0, c0, conv_impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_channel_padding_path():
    # cin/cout not multiples of the tiles -> zero-padded internally
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 7, 7, 20).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 20, 12).astype(np.float32) * 0.1)
    b = jnp.asarray(np.zeros(12, np.float32))
    want = np.asarray(cube_conv3x3_reference(x, w, b))
    got = np.asarray(cube_conv3x3(x, w, b, ci_tile=16, co_tile=8, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_train_step_conv_impl_pallas_matches():
    """The FULL optimization step (losses + custom VJP + Adam) under
    conv_impl='pallas' matches the xla step — the gate is safe end-to-end,
    gradients included."""
    import optax

    from cp360_tpu.config import Config
    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.train.loop import make_train_step

    rng = np.random.RandomState(6)
    seq = jnp.asarray(rng.rand(1, 5, 6, 7, 7, 8).astype(np.float32))
    flows = jnp.asarray(rng.randn(1, 5, 8, 16, 2).astype(np.float32))
    params = init_clstm_params(jax.random.PRNGKey(0), 8, 8)

    results = {}
    for impl in ("xla", "pallas"):
        cfg = Config(input_size=8, hidden_size=8, flow_h=8,
                     compute_dtype="float32", lr=1e-3, clstm_conv_impl=impl)
        opt = optax.adam(cfg.lr)
        p = jax.tree.map(jnp.array, params)
        st = opt.init(p)
        p2, _, metrics = make_train_step(cfg, opt)(p, st, seq, flows)
        results[impl] = (float(metrics["loss"]), p2)

    assert abs(results["pallas"][0] - results["xla"][0]) < 1e-3 * (
        1 + abs(results["xla"][0]))
    for lx, lp in zip(jax.tree.leaves(results["xla"][1]),
                      jax.tree.leaves(results["pallas"][1])):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   atol=5e-4, rtol=5e-4)
