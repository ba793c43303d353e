"""TPU-native variational optical flow with the DeepFlow/Brox energy.

The reference trains against OpenCV-contrib DeepFlow
(utils/optical_flow.py:24-29).  DeepFlow (Weinzaepfel et al., ICCV'13) is
the Brox'04 variational energy — robust (Charbonnier) *color constancy* +
*gradient constancy* data terms and a robust TV-like smoothness term,
minimized coarse-to-fine with warping — plus a DeepMatching descriptor-
correspondence term that only matters for displacements larger than the
pyramid can capture (fast large motion).  This module implements that
variational energy natively for the TPU:

    E(w) = ∫ Ψ(|I2(x+w) − I1(x)|²) + γ Ψ(|∇I2(x+w) − ∇I1(x)|²)
         + α Ψ(|∇u|² + |∇v|²),          Ψ(s²) = sqrt(s² + ε²)

minimized with the standard nested fixed-point scheme: outer warping
iterations re-linearize the data term at the current flow; middle
iterations lag the non-linear Ψ′ factors; the inner solver runs Jacobi
sweeps on the resulting linear system, solving the per-pixel coupled 2×2
(du, dv) block exactly — an elementwise division, no matrix inversion.

Why it beats the shipped Horn-Schunck at motion boundaries: HS's quadratic
penalties average motions across discontinuities (the moving-patch EPE is
dominated by the halo around the patch); the Charbonnier smoothness here is
an edge-preserving diffusion whose weights collapse exactly at flow edges,
and the robust data term down-weights occluded pixels instead of letting
them drag the solution.  The gradient-constancy term adds illumination-
change robustness (DeepFlow's reason for carrying it).

The missing DeepMatching term is documented, deliberately: the videos this
framework processes are consecutive frames at ≥24 fps where displacements
are a few pixels — inside the pyramid's basin — and every quantitative
claim is CI-measured against analytic ground-truth motion
(tools/flow_backend_report.py, tests/test_flow_backends.py).

TPU numerics note (same discipline as optical_flow.py): every stencil is an
explicit VPU shift/multiply-add chain, never a conv/matmul — f32 convs
round through the single-pass-bf16 MXU on this libtpu and the error
compounds across hundreds of solver sweeps (measured 0.58 vs 0.003 EPE for
identical math).  Elementwise f32 add/mul/div are exact; the Charbonnier
sqrt is the one 1-ulp-inexact primitive on this libtpu, so the solver is
CPU/TPU-consistent to ≤1e-4 px (measured full solve at 960×480) rather
than bit-identical like the sqrt-free Horn-Schunck solver.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.flow.optical_flow import (
    _downsample2,
    _gauss5,
    _grad,
    _median3,
    _postprocess_magnitude,
    _upsample2,
    _warp_valid,
)

_EPS2 = 1e-6  # Charbonnier ε² (ε = 1e-3, the Brox/DeepFlow standard)


def _psi_deriv(s2: jax.Array) -> jax.Array:
    """Ψ′(s²) = 1 / (2 sqrt(s² + ε²)) up to the constant 2 (absorbed into
    the weights: every term in the Euler–Lagrange equation carries the same
    factor, so it cancels).

    1/sqrt, NOT lax.rsqrt: TPU rsqrt is a fast approximation, and its few-
    ulp error feeds back through hundreds of lagged-Ψ′ sweeps (measured:
    rsqrt diverged CPU vs TPU by 4.04 px at the patch motion boundary,
    where the diffusion weights gate a bistable solution; 1/sqrt brings the
    full-solve deviation to ≤1e-4 px).  Exact bit-identity is NOT
    attainable: this libtpu's f32 sqrt is itself 1-ulp inexact (measured
    against CPU over 65k samples; divide IS exact, which is why the
    sqrt-free Horn-Schunck solver in optical_flow.py is bit-identical)."""
    return 1.0 / jnp.sqrt(s2 + _EPS2)


def _shift_pad(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """x shifted so out[y, x] = x[y+dy, x+dx], out-of-bounds entries 0."""
    h, w = x.shape
    up = jnp.pad(x, ((1, 1), (1, 1)))
    return jax.lax.dynamic_slice(up, (1 + dy, 1 + dx), (h, w))


def _edge_masks(h: int, w: int):
    """Static in-bounds masks for the 4-neighborhood (zero-Neumann border:
    an out-of-frame neighbor simply contributes no diffusion edge)."""
    m_n = jnp.ones((h, w), jnp.float32).at[0, :].set(0.0)
    m_s = jnp.ones((h, w), jnp.float32).at[h - 1, :].set(0.0)
    m_w = jnp.ones((h, w), jnp.float32).at[:, 0].set(0.0)
    m_e = jnp.ones((h, w), jnp.float32).at[:, w - 1].set(0.0)
    return m_n, m_s, m_w, m_e


def _level_solve(a, b, u, v, alpha, gamma, fp_iters, solver_iters):
    """One warp linearization at (u, v): returns the flow increment (du, dv).

    a, b: first frame and SECOND frame (unwarped) at this pyramid level.
    """
    bw, valid = _warp_valid(b, u, v)
    ax, ay = _grad(a)
    # Derivatives of the warped image: differentiate after warping (the
    # standard discretization — grad(warp(b)) — not warp(grad(b)), so the
    # data and gradient terms see the same sample lattice).
    bx, by = _grad(bw)
    ix = 0.5 * (ax + bx) * valid
    iy = 0.5 * (ay + by) * valid
    iz = (bw - a) * valid
    # gradient-constancy channel: residual of ∇I and its (second) derivatives
    ixx, ixy_a = _grad(ix)
    ixy_b, iyy = _grad(iy)
    ixy = 0.5 * (ixy_a + ixy_b)
    ixz = (bx - ax) * valid
    iyz = (by - ay) * valid

    h, w = a.shape
    m_n, m_s, m_w, m_e = _edge_masks(h, w)

    du = jnp.zeros_like(u)
    dv = jnp.zeros_like(v)

    def fp_body(_, carry):
        du, dv = carry
        # --- lagged nonlinearity: robust factors at the current increment
        r_d = iz + ix * du + iy * dv
        psi_d = _psi_deriv(r_d * r_d)
        r_gx = ixz + ixx * du + ixy * dv
        r_gy = iyz + ixy * du + iyy * dv
        psi_g = _psi_deriv(r_gx * r_gx + r_gy * r_gy)

        ut = u + du
        vt = v + dv
        ux, uy = _grad(ut)
        vx, vy = _grad(vt)
        psi_s = _psi_deriv(ux * ux + uy * uy + vx * vx + vy * vy)

        # diffusion edge weights: arithmetic mean of Ψ′_S across each edge
        w_n = 0.5 * (psi_s + _shift_pad(psi_s, -1, 0)) * m_n
        w_s = 0.5 * (psi_s + _shift_pad(psi_s, 1, 0)) * m_s
        w_w = 0.5 * (psi_s + _shift_pad(psi_s, 0, -1)) * m_w
        w_e = 0.5 * (psi_s + _shift_pad(psi_s, 0, 1)) * m_e
        sum_w = w_n + w_s + w_w + w_e

        # constant (per fixed-point iteration) pieces of the 2x2 blocks
        a11 = psi_d * ix * ix + gamma * psi_g * (ixx * ixx + ixy * ixy) + alpha * sum_w
        a22 = psi_d * iy * iy + gamma * psi_g * (ixy * ixy + iyy * iyy) + alpha * sum_w
        a12 = psi_d * ix * iy + gamma * psi_g * (ixx * ixy + ixy * iyy)
        c1 = -psi_d * ix * iz - gamma * psi_g * (ixx * ixz + ixy * iyz)
        c2 = -psi_d * iy * iz - gamma * psi_g * (ixy * ixz + iyy * iyz)
        det = a11 * a22 - a12 * a12  # ≥ α²·sum_w² > 0 in the interior

        def jacobi(_, carry):
            du, dv = carry
            ut = u + du
            vt = v + dv
            nb_u = (w_n * _shift_pad(ut, -1, 0) + w_s * _shift_pad(ut, 1, 0)
                    + w_w * _shift_pad(ut, 0, -1) + w_e * _shift_pad(ut, 0, 1))
            nb_v = (w_n * _shift_pad(vt, -1, 0) + w_s * _shift_pad(vt, 1, 0)
                    + w_w * _shift_pad(vt, 0, -1) + w_e * _shift_pad(vt, 0, 1))
            b1 = c1 + alpha * (nb_u - sum_w * u)
            b2 = c2 + alpha * (nb_v - sum_w * v)
            du = (a22 * b1 - a12 * b2) / det
            dv = (a11 * b2 - a12 * b1) / det
            return du, dv

        return jax.lax.fori_loop(0, solver_iters, jacobi, (du, dv))

    du, dv = jax.lax.fori_loop(0, fp_iters, fp_body, (du, dv))
    return du, dv


@partial(jax.jit, static_argnames=("levels", "n_warp", "fp_iters",
                                   "solver_iters", "presmooth", "median"))
def brox_flow(
    prev_gray: jax.Array,
    cur_gray: jax.Array,
    alpha: float = 0.02,
    gamma: float = 0.5,
    levels: int = 5,
    n_warp: int = 3,
    fp_iters: int = 5,
    solver_iters: int = 25,
    presmooth: bool = True,
    median: bool = True,
) -> jax.Array:
    """Dense flow [H, W, 2] (dx, dy) minimizing the DeepFlow/Brox energy.

    Inputs are grayscale in [0, 1].  ``alpha``/``gamma`` are the smoothness
    and gradient-constancy weights in those intensity units (defaults tuned
    on the analytic-motion scenes of tools/flow_backend_report.py —
    measured there: EPE 0.004/0.066/0.037 translation/patch/rotation at
    width 480, vs Farneback 0.044/0.078/0.087 and the shipped Horn-Schunck
    0.003/0.120/0.056; the moving-patch win is the robust smoothness term
    refusing to diffuse across the motion boundary).

    Structure per pyramid level (coarse→fine, factor-2 pyramid as in
    optical_flow.py): ``n_warp`` outer warps × ``fp_iters`` lagged-Ψ′
    fixed-point steps × ``solver_iters`` Jacobi sweeps with the per-pixel
    2×2 (du, dv) block solved in closed form.  All stencils are exact-f32
    VPU shift/add chains; the solver is deterministic and CPU/TPU-
    consistent to ≤1e-4 px (see module docstring — the Charbonnier sqrt is
    1-ulp inexact on this libtpu, everything else is exact).
    """
    i1 = prev_gray.astype(jnp.float32)
    i2 = cur_gray.astype(jnp.float32)
    if presmooth:
        i1, i2 = _gauss5(i1), _gauss5(i2)
    pyr = [(i1, i2)]
    for _ in range(levels - 1):
        i1 = _downsample2(i1)
        i2 = _downsample2(i2)
        pyr.append((i1, i2))

    u = jnp.zeros_like(pyr[-1][0])
    v = jnp.zeros_like(pyr[-1][0])
    for li in range(levels - 1, -1, -1):
        a, b = pyr[li]
        if u.shape != a.shape:
            u = _upsample2(u, *a.shape) * 2.0
            v = _upsample2(v, *a.shape) * 2.0
        for _ in range(n_warp):
            du, dv = _level_solve(a, b, u, v, alpha, gamma, fp_iters, solver_iters)
            u = u + du
            v = v + dv
            if median:
                u, v = _median3(u), _median3(v)
    return jnp.stack([u, v], axis=-1)


@partial(jax.jit, static_argnames=("levels", "n_warp", "fp_iters",
                                   "solver_iters", "presmooth", "median"))
def brox_flow_batch(
    prev_gray: jax.Array,
    cur_gray: jax.Array,
    alpha: float = 0.02,
    gamma: float = 0.5,
    levels: int = 5,
    n_warp: int = 3,
    fp_iters: int = 5,
    solver_iters: int = 25,
    presmooth: bool = True,
    median: bool = True,
) -> jax.Array:
    """Batched :func:`brox_flow`: [N, H, W] pairs -> [N, H, W, 2] via vmap
    (static shapes; the batch rides the VPU lanes — see
    horn_schunck_flow_batch for the throughput rationale)."""
    return jax.vmap(
        lambda a, b: brox_flow(a, b, alpha, gamma, levels, n_warp, fp_iters,
                               solver_iters, presmooth, median)
    )(prev_gray, cur_gray)


def calc_optical_flow_variational(
    prev_frame: np.ndarray, cur_frame: np.ndarray, res: Tuple[int, int] = (960, 480)
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop-in for flow.calc_optical_flow with the TPU variational solver.

    Same pre/post-processing contract as the reference wrapper
    (utils/optical_flow.py:7-39): LANCZOS resize to ``res``, BGR→RGB→gray,
    returns (normalized magnitude with < mean−1.5σ zeroed, raw flow).
    Selected with config ``flow_backend: variational``.
    """
    from cp360_tpu.flow.optical_flow import _preprocess_pair

    prev, cur = _preprocess_pair(prev_frame, cur_frame, res)

    from cp360_tpu.utils.transfer import fetch_np

    flow = fetch_np(  # async-enqueued D2H — plain np.asarray is ~20x slower here
        brox_flow(
            jnp.asarray(prev, jnp.float32) / 255.0,
            jnp.asarray(cur, jnp.float32) / 255.0,
        )
    )
    return _postprocess_magnitude(flow), flow
