"""Cube-padded convolutional LSTM (functional, lax.scan-ready).

Capability parity with the reference single-cell ConvLSTM
(model/clstm.py:19-101): three stacked 3x3 VALID convs, each preceded by
cube padding, producing the 4 LSTM gates over the [*, 6, 7, 7, C] CAM cube.

Deltas from the reference, by design:
- the dead LogSoftmax whose output is discarded (model/clstm.py:35,81-82)
  is not computed;
- the time rollout is a jax.lax.scan (reference: a Python loop per window,
  temporal_model/test_temporal.py:76-79), and whole batches of independent
  windows ride the batch axis.

Gate order in the stacked channel dim matches torch ``chunk(4, 1)``:
input, forget(remember), output, cell (model/clstm.py:68).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cp360_tpu.models import layers
from cp360_tpu.ops import cube_pad as cp_ops


def init_clstm_params(key: jax.Array, input_size: int, hidden_size: int, dtype=jnp.float32) -> dict:
    """He-init (reference model/clstm.py:84-90); biases zero."""
    k1, k2, k3 = jax.random.split(key, 3)
    h4 = 4 * hidden_size
    return {
        "conv1": {
            "w": layers.he_conv(k1, 3, 3, input_size + hidden_size, h4, dtype),
            "b": jnp.zeros((h4,), dtype),
        },
        "conv2": {"w": layers.he_conv(k2, 3, 3, h4, h4, dtype), "b": jnp.zeros((h4,), dtype)},
        "gates": {"w": layers.he_conv(k3, 3, 3, h4, h4, dtype), "b": jnp.zeros((h4,), dtype)},
    }


def _pad6(x: jax.Array, use_cube_pad: bool) -> jax.Array:
    x6 = x.reshape(-1, 6, *x.shape[1:])
    x6 = cp_ops.cube_pad(x6, 1) if use_cube_pad else cp_ops.zero_pad(x6, 1)
    return x6.reshape(-1, *x6.shape[2:])


def _conv(params: dict, x: jax.Array, use_cube_pad: bool, compute_dtype,
          conv_impl: str) -> jax.Array:
    """One cube-padded 3x3 conv on face-flattened [B*6, H, W, C] input.

    conv_impl "xla": materialized cube pad + lax conv (the default).
    conv_impl "pallas": the fused pad+conv kernel
    (ops/pallas_kernels.cube_conv3x3_train, custom VJP) — the padded
    intermediate never exists.  Falls back to interpret mode off-TPU so the
    gate stays testable on the CPU mesh.
    """
    if conv_impl == "pallas" and use_cube_pad and x.shape[1] == x.shape[2]:
        from cp360_tpu.ops.pallas_kernels import cube_conv3x3_train

        w, b = params["w"], params["b"]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)
        x6 = x.reshape(-1, 6, *x.shape[1:])
        interpret = jax.default_backend() != "tpu"
        out = cube_conv3x3_train(x6, w, b, interpret)
        return out.reshape(-1, *out.shape[2:])
    return layers.conv2d(_pad6(x, use_cube_pad), params["w"], params["b"],
                         compute_dtype=compute_dtype)


def clstm_step(
    params: dict,
    x: jax.Array,
    state: Tuple[jax.Array, jax.Array],
    use_cube_pad: bool = True,
    compute_dtype=jnp.float32,
    conv_impl: str = "xla",
) -> Tuple[jax.Array, jax.Array]:
    """One ConvLSTM step.

    Args:
      x: [B*6, H, W, Cin] input cube faces (face-flattened batch).
      state: (hidden, cell), each [B*6, H, W, Ch].
      conv_impl: "xla" | "pallas" (config ``clstm_conv_impl``) — see _conv.

    Returns new (hidden, cell).
    """
    h, c = state
    z = jnp.concatenate([x, h], axis=-1)
    out = _conv(params["conv1"], z, use_cube_pad, compute_dtype, conv_impl)
    out = jax.nn.relu(out)
    out = _conv(params["conv2"], out, use_cube_pad, compute_dtype, conv_impl)
    out = jax.nn.relu(out)
    gates = _conv(params["gates"], out, use_cube_pad, compute_dtype, conv_impl)

    i_g, f_g, o_g, c_g = jnp.split(gates, 4, axis=-1)
    i_g = jax.nn.sigmoid(i_g)
    f_g = jax.nn.sigmoid(f_g)
    o_g = jax.nn.sigmoid(o_g)
    c_g = jnp.tanh(c_g)

    cell = f_g * c + i_g * c_g
    hidden = o_g * jnp.tanh(cell)
    return hidden, cell


@partial(jax.jit, static_argnames=("use_cube_pad", "compute_dtype", "remat", "conv_impl"))
def clstm_rollout(
    params: dict,
    seq: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    use_cube_pad: bool = True,
    compute_dtype=jnp.float32,
    remat: bool = False,
    conv_impl: str = "xla",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scan the cell over time.

    Args:
      seq: [T, B*6, H, W, Cin].
      h0, c0: [B*6, H, W, Ch] initial state (the protocol seeds both with
        the normalized first frame, temporal_model/test_temporal.py:70-73).
      remat: rematerialize each step's intermediates in the backward pass
        (trades FLOPs for HBM — enables much larger window batches when
        training; a no-op for inference).

    Returns (hiddens [T, B*6, H, W, Ch], final hidden, final cell).
    """

    def step(carry, x):
        h, c = clstm_step(params, x, carry, use_cube_pad, compute_dtype, conv_impl)
        return (h, c), h

    if remat:
        step = jax.checkpoint(step)
    (h, c), hs = jax.lax.scan(step, (h0, c0), seq)
    return hs, h, c
