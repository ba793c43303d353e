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
MXU.  ``cube_conv3x3`` is the inference form; ``cube_conv3x3_train`` adds a
custom VJP (the input gradient is the same kernel on the scatter-form
selection matrix) so the training step can also run it — both are gated by
the ``clstm_conv_impl`` config key, and parity is tested against the
gather-based reference path in forward and backward.

Measured on one v5e (round 2, chained-dependency timing — block_until_ready
lies through this host's transfer tunnel, see CLAUDE.md / tools/bench_pallas.py):

- A *standalone-jitted* XLA cube-pad+conv is pathological on this libtpu:
  4.3 s for the 677-GFLOP [16,6,7,7,2000]->4000 conv (0.16 TF/s).  This
  kernel does the same op in 27 ms — ~160x faster standalone.
- *In-graph* (inside the jitted train-step scan) XLA's convs run at
  ~105 TF/s effective, which beats this kernel's measured 25-46 TF/s, so
  the ConvLSTM keeps ``clstm_conv_impl: xla`` by default; the gate swaps
  in this kernel (with its custom VJP) per config.
- Schedule space on this toolchain is hard-walled: any x-block lane width
  above 128 (ci_tile 256/512, with or without a raised scoped-VMEM limit,
  2-D or 3-D operands, single or split dots) runs ~150x slow, and
  accumulators beyond ~11 MB force HBM spills.  ci_tile=128 bounds
  arithmetic intensity at ~32 FLOP per accumulator byte, which is exactly
  the ~25-46 TF/s observed.  The numbers table lives in PARITY.md.
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


@lru_cache(maxsize=8)
def build_scatter_matrix(h: int, w: int) -> np.ndarray:
    """B2 [6hw, 9 * 6hw]: the *transposed* selection, for the input gradient.

    dx[q] = sum_{k,p} A_k[p, q] (dy @ W_k^T)[p]  —  so B2[q, k*rows + p] =
    A_k[p, q] and the backward pass is the SAME kernel with (A2 -> B2,
    W_k -> W_k^T, x -> dy)."""
    rows = 6 * h * w
    a = build_selection_matrix(h, w).reshape(9, rows, rows)
    return np.ascontiguousarray(np.transpose(a, (2, 0, 1)).reshape(rows, 9 * rows))


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


def _conv_core(
    x2: jax.Array,
    w2: jax.Array,
    b: jax.Array,
    sel: np.ndarray,
    ci_tile: int,
    co_tile: int,
    block_n: int,
    interpret: bool,
) -> jax.Array:
    """Shared executor: x2 [N, rows, Cin] x w2 [9, Cin, Cout] under the
    selection matrix ``sel`` [rows, 9*rows] -> [N, rows, Cout].

    Forward passes A2 (gather form); the input-gradient pass reuses this
    with B2 (scatter form) and tap-transposed weights — the two directions
    are the same program on different constant operands.
    """
    n, rows, cin = x2.shape
    cout = w2.shape[-1]

    # Selection operand in the input dtype: exact for a 0/1 matrix; on the
    # bf16 path this keeps the MXU at full rate (f32 matmuls cost ~8x) at
    # the price of one bf16 rounding of the 9 tap sums.
    a2 = jnp.asarray(sel, x2.dtype)

    ci_tile = min(ci_tile, _round_up(cin, 128))
    co_tile = min(co_tile, _round_up(cout, 128))
    cin_p = _round_up(cin, ci_tile)
    cout_p = _round_up(cout, co_tile)
    n_p = _round_up(n, block_n)
    if cin_p != cin or n_p != n:
        x2 = jnp.pad(x2, ((0, n_p - n), (0, 0), (0, cin_p - cin)))
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
        out_shape=jax.ShapeDtypeStruct((n_p, rows, cout_p), x2.dtype),
        scratch_shapes=[pltpu.VMEM((9 * rows, block_n * co_tile), jnp.float32)],
        # The default schedule needs ~19 MB scoped VMEM (10 MB f32
        # accumulator + multi-buffered operands); raise XLA's default 16 MB
        # scoped limit.  NOTE: the limit only permits compilation — blocks
        # that exceed physical VMEM spill and run ~150x slow (measured), so
        # schedules are chosen to fit (see module docstring).
        compiler_params=None if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(a2, x2, w2, b2)

    return out[:n, :, :cout]


@partial(jax.jit, static_argnames=("ci_tile", "co_tile", "block_n", "interpret"))
def cube_conv3x3(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    ci_tile: int = 128,
    co_tile: int = 128,
    block_n: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Cube-padded 3x3 VALID conv on cube feature maps, fused in VMEM.

    Args:
      x: [N, 6, h, w, Cin] cube features (bf16 or f32), h == w (small).
      w: [3, 3, Cin, Cout] HWIO kernel.
      b: [Cout] bias.

    Returns [N, 6, h, w, Cout] with f32 accumulation, cast to x.dtype.

    Default schedule (block_n=8, ci_tile=128): the W stream dominates HBM
    traffic (full W must be seen once per sample block), so 8-sample blocks
    halve W traffic vs block_n=4; ci_tile=128 keeps the f32 accumulator
    (9*rows x 8*co_tile = 10.3 MB) + double-buffered operands inside the
    ~16 MB VMEM.
    """
    n, six, h, ww, cin = x.shape
    assert six == 6 and h == ww
    cout = w.shape[-1]
    rows = 6 * h * ww
    x2 = x.reshape(n, rows, cin)
    w2 = w.reshape(9, cin, cout)
    out = _conv_core(x2, w2, b, build_gather_matrix(h, ww),
                     ci_tile, co_tile, block_n, interpret)
    return out.reshape(n, 6, h, ww, cout)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def cube_conv3x3_train(x: jax.Array, w: jax.Array, b: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """Differentiable :func:`cube_conv3x3` (training path).

    Forward and input-gradient both run the fused Pallas kernel (the input
    gradient is the same program with the scatter-form selection matrix and
    tap-transposed weights); the weight/bias gradients contract over
    (samples x positions) via XLA einsums on the selection-expanded input —
    an MXU-shaped reduction XLA already schedules well.
    """
    return cube_conv3x3(x, w, b, interpret=interpret)


def _cc_fwd(x, w, b, interpret):
    return cube_conv3x3(x, w, b, interpret=interpret), (x, w)


def _cc_bwd(interpret, res, dy):
    x, w = res
    n, six, h, ww, cin = x.shape
    cout = w.shape[-1]
    rows = 6 * h * ww
    dy2 = dy.reshape(n, rows, cout)

    # dx: same kernel, scatter selection, W_k -> W_k^T.
    wt = jnp.transpose(w.reshape(9, cin, cout), (0, 2, 1))  # [9, Cout, Cin]
    dx = _conv_core(dy2, wt, jnp.zeros((cin,), dy.dtype),
                    build_scatter_matrix(h, ww), 128, 128, 8, interpret)
    dx = dx.reshape(x.shape).astype(x.dtype)

    # dw[k] = sum_{n,p} (A_k x)[n,p] dy[n,p]^T.  Fold A_k into dy instead of
    # x (dy_k = A_k^T dy) so the 9x selection-expanded activations never
    # materialize — at production shapes (rows=294, Cin up to 4000) that
    # expansion is hundreds of MB per conv per scan step.  lax.map keeps one
    # [n, rows, Cout] temporary live at a time.
    a = jnp.asarray(build_selection_matrix(h, ww), x.dtype).reshape(9, rows, rows)
    x2 = x.reshape(n, rows, cin)

    def _tap_dw(a_k):
        dy_k = jnp.einsum("pq,npo->nqo", a_k, dy2)
        return jnp.einsum("nqc,nqo->co", x2, dy_k,
                          preferred_element_type=jnp.float32)

    dw = jax.lax.map(_tap_dw, a)  # [9, Cin, Cout]
    dw = dw.reshape(3, 3, cin, cout).astype(w.dtype)
    db = jnp.sum(dy2, axis=(0, 1), dtype=jnp.float32).astype(w.dtype)
    return dx, dw, db


cube_conv3x3_train.defvjp(_cc_fwd, _cc_bwd)


def cube_conv3x3_reference(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Gather-pad + lax.conv formulation (the XLA path) — test oracle."""
    from cp360_tpu.models.layers import conv2d
    from cp360_tpu.ops.cube_pad import cube_pad

    n, six, h, ww, cin = x.shape
    xp = cube_pad(x, 1).reshape(n * 6, h + 2, ww + 2, cin)
    out = conv2d(xp, w, b)
    return out.reshape(n, 6, h, ww, -1)
