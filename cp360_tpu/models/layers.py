"""Functional NN layers (NHWC, pure JAX).

Thin wrappers around lax primitives with torch-compatible numerics, used by
the cube-padded ResNet (reference: model/resnet_cubic.py) and ConvLSTM
(reference: model/clstm.py).  Parameters live in plain nested dicts so the
torch->npz weight converters (cp360_tpu/compat) map 1:1.

Layout: activations NHWC, conv kernels HWIO (torch OIHW is transposed at
conversion time).  bf16-friendly: convs accept a ``compute_dtype`` and
accumulate in f32 via preferred_element_type.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Padding = Union[str, Sequence[Tuple[int, int]]]


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int | Tuple[int, int] = 1,
    padding: Padding = "VALID",
    compute_dtype: Optional[jnp.dtype] = None,
    groups: int = 1,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC, f32 accumulation.

    ``groups`` maps to feature_group_count (HWIO kernel [kh, kw, cin/groups,
    cout]); groups == cin with a [kh, kw, 1, cin]-shaped kernel is a
    depthwise conv (the MobileNet family).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    orig_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # True-f32 operands mean a parity/eval path: request full f32 mults
    # (XLA's default relaxes f32 convs to lower precision on CPU and TPU).
    # bf16 operands: no preferred_element_type — the MXU accumulates f32
    # internally and only the output store rounds; requesting an f32 output
    # breaks the conv transpose under autodiff (mixed-dtype operands).
    is_f32 = x.dtype == jnp.float32
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if is_f32 else None,
        precision="highest" if is_f32 else None,
    )
    out = out.astype(orig_dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def batch_norm(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    """Inference-mode batch norm with running statistics.

    p: {'scale', 'bias', 'mean', 'var'} each [C].  Matches torch
    BatchNorm2d.eval() (the reference only ever runs the CNN frozen,
    static_model/dataset_feat_extractor.py:47-57).
    """
    inv = lax.rsqrt(p["var"].astype(jnp.float32) + eps) * p["scale"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * inv
    return (x.astype(jnp.float32) * inv + shift).astype(x.dtype)


def max_pool(x: jax.Array, k: int, stride: int) -> jax.Array:
    """Max pooling, VALID padding (the models pre-pad explicitly)."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, k, k, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """Average pooling with window=stride=k, VALID."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, k, k, 1), "VALID")
    return s / (k * k)


def linear(x: jax.Array, p: dict) -> jax.Array:
    """x [N, in] @ w [in, out] + b."""
    precision = "highest" if x.dtype == jnp.float32 else None
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32, precision=precision)
    return y.astype(x.dtype) + p["b"]


# ---------------------------------------------------------------------------
# Initializers (He normal fan-out, matching the reference's init scheme,
# model/resnet_cubic.py:137-143 and model/clstm.py:84-90).
# ---------------------------------------------------------------------------


def he_conv(key: jax.Array, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    std = math.sqrt(2.0 / (kh * kw * cout))
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def bn_params(c: int, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def fold_batch_norm_into_conv(conv_w: jax.Array, bn: dict, eps: float = 1e-5):
    """Fold inference BN into the preceding conv: returns (w', b').

    Exact algebra: y = (x*W - mean) * scale/sqrt(var+eps) + bias.
    Available for offline checkpoint preparation (fewer params to ship /
    inspect); the hot graphs keep explicit batch_norm — XLA already fuses
    the elementwise scale/shift into the conv output, so folding buys no
    measured step time.  Folding math is pinned by tests/test_models.py.
    """
    scale = np.asarray(bn["scale"], np.float64)
    var = np.asarray(bn["var"], np.float64)
    mean = np.asarray(bn["mean"], np.float64)
    bias = np.asarray(bn["bias"], np.float64)
    g = scale / np.sqrt(var + eps)
    w = np.asarray(conv_w, np.float64) * g[None, None, None, :]
    b = bias - mean * g
    return jnp.asarray(w, conv_w.dtype), jnp.asarray(b, conv_w.dtype)


def pad_faces(x: jax.Array, p: int, use_cube_pad: bool = True) -> jax.Array:
    """Pad a face-flattened batch [N*6, H, W, C] (cube- or zero-pad).

    The reshape-to-[N,6]-pad-reshape-back idiom every cube-padded backbone
    shares (reference wrapper: model/cube_pad.py:23-42, which instead
    asserts divisibility and loops over cubes).
    """
    if p == 0:
        return x
    from cp360_tpu.ops import cube_pad as cp_ops

    x6 = x.reshape(-1, 6, *x.shape[1:])
    x6 = cp_ops.cube_pad(x6, p) if use_cube_pad else cp_ops.zero_pad(x6, p)
    return x6.reshape(-1, *x6.shape[2:])
