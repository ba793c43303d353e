"""Pallas TPU kernels for the hot ConvLSTM path.

``cube_conv3x3`` fuses cube padding + 3x3 VALID convolution for small
(h x w <= ~16x16) cube feature maps — the op executed 3x per ConvLSTM step
on [B*6, 7, 7, 4000] tensors (model/clstm.py:57-65 in the reference; our
cp360_tpu/models/clstm.py).  The XLA path materializes the cube-padded
[B*6, 9, 9, C] tensor in HBM before each conv; here the pad never exists:

  For 7x7 faces, cube padding + 3x3-window extraction is a *fixed linear
  selection*: out[p] = sum_k W_k^T x[sel_k(p)] over the 9 taps, with each
  sel_k a binary [294, 294] matrix (294 = 6 faces x 49 positions)
  precomputed from the cube-pad index map.  Reassociating,

      out = sum_k A_k @ (x @ W_k),

  the kernel accumulates the 9 per-tap matmuls y_k += x_ci @ W_k_ci in a
  VMEM f32 scratch across Cin tiles, then applies ONE stacked selection
  matmul A2 [294, 9*294] @ y [9*294, Cout_t] per output tile (~7% of the
  FLOPs) — so the selection cost does not scale with Cin.

Zero gathers, zero HBM round-trips for the padded tensor, all FLOPs on the
MXU.  Inference-path only (the training step keeps the autodiff-friendly
XLA formulation); parity is tested against the gather-based reference path.

Measured on one v5e at the production shape ([32, 6, 7, 7, 4000] -> 4000,
bf16): XLA's pad + conv runs at ~150 TFLOP/s (76% of peak) and this
kernel at ~121 TFLOP/s — XLA's convolution is already near-optimal here, so
the fused kernel stays OFF the default path.  It exists as the measured
alternative (and wins where the padded-intermediate HBM round-trip matters,
e.g. larger spatial extents at low arithmetic intensity).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cp360_tpu.ops.cube_pad import build_cube_pad_index_map


@lru_cache(maxsize=8)
def build_selection_matrix(h: int, w: int) -> np.ndarray:
    """A [9 * 6hw, 6hw] binary matrix: row (k * 6hw + p) selects the input
    pixel that tap k of output position p reads through cube padding."""
    pad_map = build_cube_pad_index_map(h, w, (1, 1, 1, 1))  # [6, h+2, w+2]
    rows = 6 * h * w
    a = np.zeros((9, rows, rows), np.float32)
    for k in range(9):
        dy, dx = divmod(k, 3)
        src = pad_map[:, dy : dy + h, dx : dx + w].reshape(rows)
        a[k, np.arange(rows), src] = 1.0
    return a.reshape(9 * rows, rows)


@lru_cache(maxsize=8)
def build_gather_matrix(h: int, w: int) -> np.ndarray:
    """A2 [6hw, 9 * 6hw]: out[p] = sum_k A_k[p, q] y[k, q] — the transposed,
    column-stacked form of :func:`build_selection_matrix` used after the
    channel contraction."""
    rows = 6 * h * w
    a = build_selection_matrix(h, w).reshape(9, rows, rows)
    return np.ascontiguousarray(np.transpose(a, (1, 0, 2)).reshape(rows, 9 * rows))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(a2_ref, x_ref, w_ref, b_ref, o_ref, acc_ref):
    # acc layout: [9 * rows, bn * co_t] f32 — tap-major rows, sample-blocked
    # columns, so the final selection is ONE matmul across all bn samples.
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bn, rows = x_ref.shape[0], x_ref.shape[1]
    co_t = o_ref.shape[-1]
    x = x_ref[:].reshape(bn * rows, -1)
    # 9 per-tap channel contractions, one [bn*rows, ci_t] x [ci_t, co_t]
    # matmul per tap, scattered into per-(tap, sample) blocks.
    for k in range(9):
        upd = jnp.dot(x, w_ref[k], preferred_element_type=jnp.float32)
        for n in range(bn):
            acc_ref[k * rows : (k + 1) * rows, n * co_t : (n + 1) * co_t] += (
                upd[n * rows : (n + 1) * rows]
            )

    @pl.when(ci == pl.num_programs(2) - 1)
    def _():
        # one stacked selection matmul for ALL samples:
        # out[p, n*co_t + c] = sum_{kq} A2[p, kq] acc[kq, n*co_t + c].
        # bf16 operands (A2 is 0/1-exact; the taps round once) keep the MXU
        # at full rate.
        bias = b_ref[:].astype(jnp.float32)
        y = jnp.dot(
            a2_ref[:],
            acc_ref[:].astype(a2_ref.dtype),
            preferred_element_type=jnp.float32,
        )
        for n in range(bn):
            o_ref[n] = (y[:, n * co_t : (n + 1) * co_t] + bias).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("ci_tile", "co_tile", "block_n", "interpret"))
def cube_conv3x3(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    ci_tile: int = 512,
    co_tile: int = 128,
    block_n: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Cube-padded 3x3 VALID conv on cube feature maps, fused in VMEM.

    Args:
      x: [N, 6, h, w, Cin] cube features (bf16 or f32), h == w (small).
      w: [3, 3, Cin, Cout] HWIO kernel.
      b: [Cout] bias.

    Returns [N, 6, h, w, Cout] with f32 accumulation, cast to x.dtype.
    """
    n, six, h, ww, cin = x.shape
    assert six == 6 and h == ww
    cout = w.shape[-1]
    rows = 6 * h * ww

    # Selection operand in the input dtype: exact for a 0/1 matrix; on the
    # bf16 path this keeps the MXU at full rate (f32 matmuls cost ~8x) at
    # the price of one bf16 rounding of the 9 tap sums.
    a2 = jnp.asarray(build_gather_matrix(h, ww), x.dtype)

    cin_p = _round_up(cin, ci_tile)
    cout_p = _round_up(cout, co_tile)
    n_p = _round_up(n, block_n)
    x2 = x.reshape(n, rows, cin)
    if cin_p != cin or n_p != n:
        x2 = jnp.pad(x2, ((0, n_p - n), (0, 0), (0, cin_p - cin)))
    w2 = w.reshape(9, cin, cout)
    if cin_p != cin or cout_p != cout:
        w2 = jnp.pad(w2, ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    b2 = b
    if cout_p != cout:
        b2 = jnp.pad(b, ((0, cout_p - cout),))
    b2 = b2[None, :]  # [1, Cout_p]

    grid = (n_p // block_n, cout_p // co_tile, cin_p // ci_tile)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 9 * rows), lambda ni, co, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, rows, ci_tile), lambda ni, co, ci: (ni, 0, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ci_tile, co_tile), lambda ni, co, ci: (0, ci, co), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda ni, co, ci: (0, co), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, rows, co_tile), lambda ni, co, ci: (ni, 0, co), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_p, rows, cout_p), x.dtype),
        scratch_shapes=[pltpu.VMEM((9 * rows, block_n * co_tile), jnp.float32)],
        interpret=interpret,
    )(a2, x2, w2, b2)

    return out[:n, :, :cout].reshape(n, 6, h, ww, cout)


def cube_conv3x3_reference(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Gather-pad + lax.conv formulation (the XLA path) — test oracle."""
    from cp360_tpu.models.layers import conv2d
    from cp360_tpu.ops.cube_pad import cube_pad

    n, six, h, ww, cin = x.shape
    xp = cube_pad(x, 1).reshape(n * 6, h + 2, ww + 2, cin)
    out = conv2d(xp, w, b)
    return out.reshape(n, 6, h, ww, -1)
