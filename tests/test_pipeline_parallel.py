"""Pipelined ConvLSTM (pp/sp over ppermute) vs the serial scan — exact."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.models.clstm import clstm_rollout, init_clstm_params
from cp360_tpu.parallel.pipeline import PIPE_AXIS, make_pipe_mesh, pipelined_rollout


@pytest.fixture(scope="module")
def setup():
    params = init_clstm_params(jax.random.PRNGKey(0), 8, 8)
    rng = np.random.RandomState(0)
    t, b = 8, 4 * 6  # 4 windows of 6 faces, 8 time steps
    seq = jnp.asarray(rng.rand(t, b, 7, 7, 8).astype(np.float32))
    h0 = c0 = seq[0]
    return params, seq, h0, c0


@pytest.mark.parametrize("n_pipe,n_micro", [(4, 2), (2, 4), (8, 1)])
def test_pipelined_matches_serial(setup, n_pipe, n_micro):
    params, seq, h0, c0 = setup
    want_hs, want_h, want_c = clstm_rollout(params, seq, h0, c0)

    mesh = make_pipe_mesh(n_pipe)
    got_hs, got_h, got_c = pipelined_rollout(
        params, seq, h0, c0, mesh, n_micro=n_micro)

    tc = seq.shape[0] // n_pipe
    np.testing.assert_allclose(np.asarray(got_hs), np.asarray(want_hs[-tc:]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), atol=1e-6)


def test_pipelined_validates_divisibility(setup):
    params, seq, h0, c0 = setup
    mesh = make_pipe_mesh(4)
    with pytest.raises(ValueError, match="divide"):
        pipelined_rollout(params, seq[:7], h0, c0, mesh, n_micro=2)
    with pytest.raises(ValueError, match="microbatches"):
        pipelined_rollout(params, seq, h0, c0, mesh, n_micro=5)
