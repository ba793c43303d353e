"""Class Activation Mapping head — hook-free, fully on device.

Reference (static_model/class_activation_model.py:13-85) captures layer4
via a forward hook, copies it to host, and matmuls against the (non-negative
shifted) classifier weight in NumPy per face.  Here the whole thing is one
fused device computation: the ResNet forward returns its feature map
functionally and the score cube is a single einsum on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cp360_tpu.models.resnet import resnet_apply


def shift_weight_nonneg(fc_w: jax.Array) -> jax.Array:
    """Shift the classifier weight so its minimum is >= 0.

    Reference: class_activation_model.py:51-52 — applied only when the min
    is negative, which the unconditional `w - min(min, 0)` reproduces.
    """
    return fc_w - jnp.minimum(jnp.min(fc_w), 0.0)


def cam_scores(feats: jax.Array, fc_w: jax.Array) -> jax.Array:
    """Per-face class score maps.

    Args:
      feats: [B, h, w, C] layer4 features (B = N*6 faces).
      fc_w: [C, num_classes] classifier weight (our fc layout; the torch
        [num_classes, C] layout is transposed by the weight converter).

    Returns [B, h, w, num_classes] score maps (reference layout [B, K, h, w]
    is a transpose away; disk writers handle that).
    """
    w = shift_weight_nonneg(fc_w)
    return jnp.einsum(
        "bhwc,ck->bhwk", feats.astype(jnp.float32), w.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("arch", "use_cube_pad", "compute_dtype"))
def cam_forward(
    params: dict,
    cubes: jax.Array,
    arch: str = "resnet50",
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
):
    """Cube faces -> (score cube, features).

    Args:
      cubes: [N, 6, H, W, 3] normalized cube faces.

    Returns:
      scores: [N, 6, h, w, num_classes] CAM score cube (f32).
      feats:  [N, 6, h, w, C] layer4 features.
    """
    n = cubes.shape[0]
    _, feats = resnet_apply(
        params, cubes, arch=arch, use_cube_pad=use_cube_pad,
        compute_dtype=compute_dtype, with_logits=False,
    )
    scores = cam_scores(feats, params["fc"]["w"])
    h, w = feats.shape[1:3]
    return (
        scores.reshape(n, 6, h, w, -1),
        feats.reshape(n, 6, h, w, -1),
    )
