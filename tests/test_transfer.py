"""utils/transfer fetch helpers (the async-D2H fast path wrapper)."""

import numpy as np
import jax.numpy as jnp

from cp360_tpu.utils.transfer import async_start, fetch_np


def test_fetch_np_single_and_tuple():
    a = jnp.arange(6.0).reshape(2, 3)
    b = jnp.ones((3,), jnp.float32)
    got = fetch_np(a)
    assert isinstance(got, np.ndarray)
    np.testing.assert_array_equal(got, np.arange(6.0).reshape(2, 3))
    ga, gb = fetch_np(a, b)
    np.testing.assert_array_equal(ga, np.asarray(a))
    np.testing.assert_array_equal(gb, np.ones((3,), np.float32))


def test_fetch_np_passes_numpy_through():
    x = np.arange(4)
    got = fetch_np(x)
    np.testing.assert_array_equal(got, x)


def test_async_start_tolerates_plain_values():
    async_start(np.zeros(3), 5, jnp.zeros(2))  # no exception
