"""Cube-padded ResNet family (functional JAX, NHWC).

Capability parity with the reference's torchvision-derived family
(model/resnet_cubic.py:109-263): every spatial zero-padding in the
Bottleneck/stem path is replaced by cube padding so convolutions see a
seamless sphere.  Faithfully kept reference behaviours:

- stem: CubePad(3) -> 7x7/s2 VALID conv -> BN -> ReLU -> CubePad(1) ->
  3x3/s2 VALID maxpool (reference model/resnet_cubic.py:163-170)
- Bottleneck: CubePad(1) before the 3x3 VALID conv only
  (model/resnet_cubic.py:92-93)
- BasicBlock (resnet18/34) does NOT cube-pad — its 3x3 convs keep ordinary
  zero padding=1, a documented reference quirk (model/resnet_cubic.py:33-62).
  (The reference's resnet18/34 constructors actually crash as shipped —
  _make_layer passes cp= to BasicBlock which doesn't accept it,
  model/resnet_cubic.py:36,155-159; ours work.)
- ``cube_pad=False`` swaps in working zero padding (the reference's ZeroPad
  is commented out and would crash, model/cube_pad.py:219-254)

TPU-first deltas: the whole forward is one jit-able pure function over
NHWC; all six faces ride the batch axis (no per-cube Python loop); feature
maps are returned functionally instead of via forward hooks
(static_model/class_activation_model.py:36-44).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cp360_tpu.models import layers

ARCHS = {
    # name: (block kind, stage depths)
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}
_EXPANSION = {"basic": 1, "bottleneck": 4}


_pad = layers.pad_faces


def _bottleneck(p: dict, x: jax.Array, stride: int, use_cp: bool, dtype,
                conv_form: str = "pad") -> jax.Array:
    out = layers.conv2d(x, p["conv1"]["w"], compute_dtype=dtype)
    out = layers.batch_norm(out, p["bn1"])
    out = jax.nn.relu(out)

    if use_cp and conv_form == "halo" and out.shape[1] == out.shape[2]:
        # border-correction cube conv: never materializes the padded tensor
        # (ops/cube_pad.py::cube_pad_conv3x3 'halo'; reassociates the border
        # ring's sum — f32 parity paths keep 'pad')
        from cp360_tpu.ops.cube_pad import cube_pad_conv3x3

        out = cube_pad_conv3x3(
            out.reshape(-1, 6, *out.shape[1:]), p["conv2"]["w"],
            stride=stride, compute_dtype=dtype, form="halo")
        out = out.reshape(-1, *out.shape[2:])
    else:
        out = _pad(out, 1, use_cp)
        out = layers.conv2d(out, p["conv2"]["w"], stride=stride,
                            compute_dtype=dtype)
    out = layers.batch_norm(out, p["bn2"])
    out = jax.nn.relu(out)

    out = layers.conv2d(out, p["conv3"]["w"], compute_dtype=dtype)
    out = layers.batch_norm(out, p["bn3"])

    if "downsample" in p:
        res = layers.conv2d(x, p["downsample"]["conv"]["w"], stride=stride, compute_dtype=dtype)
        res = layers.batch_norm(res, p["downsample"]["bn"])
    else:
        res = x
    return jax.nn.relu(out + res)


def _basic_block(p: dict, x: jax.Array, stride: int, use_cp: bool, dtype) -> jax.Array:
    # Reference BasicBlock keeps zero padding=1 (model/resnet_cubic.py:27-41).
    del use_cp
    out = layers.conv2d(x, p["conv1"]["w"], stride=stride, padding=[(1, 1), (1, 1)], compute_dtype=dtype)
    out = layers.batch_norm(out, p["bn1"])
    out = jax.nn.relu(out)
    out = layers.conv2d(out, p["conv2"]["w"], padding=[(1, 1), (1, 1)], compute_dtype=dtype)
    out = layers.batch_norm(out, p["bn2"])
    if "downsample" in p:
        res = layers.conv2d(x, p["downsample"]["conv"]["w"], stride=stride, compute_dtype=dtype)
        res = layers.batch_norm(res, p["downsample"]["bn"])
    else:
        res = x
    return jax.nn.relu(out + res)


def _stem_space_to_depth(xp: jax.Array, w7: jax.Array,
                         compute_dtype) -> jax.Array:
    """The 7x7/stride-2 stem conv as a 4x4/stride-1 conv on 2x2
    space-to-depth input — identical math, TPU-shaped.

    At C_in=3 the MXU loads 3 of 128 lanes, making the stem the single most
    expensive conv of the backbone (measured r4: resnet50 time is dominated
    by stem+layer1, tools/profile_stage1.py).  Grouping 2x2 pixel parities
    into channels quarters the spatial extent and quadruples C_in:

      y[p,q] = sum_{k,l<7} xp[2p+k, 2q+l] w[k,l]
             = sum_{py,px<2} sum_{a,b<4} xp[2(p+a)+py, 2(q+b)+px]
                                         w[2a+py, 2b+px]

    i.e. a VALID 4x4 conv over the [.., H/2, W/2, 12] parity-split tensor
    with the kernel taps re-grouped the same way (tap 7 zero-padded).
    Exact to summation order; cross-checked vs the plain stem in
    tests/test_models.py.

    Args:
      xp: [B, Hp, Wp, 3] the ALREADY cube/zero-padded input (pad 3), Hp
        even (224+6=230 at the published geometry).
      w7: [7, 7, 3, 64] stem kernel.
    Returns [B, Hp//2 - 3, Wp//2 - 3, 64] — the same output the strided
    7x7 conv produces.
    """
    b, hp, wp, c = xp.shape
    assert hp % 2 == 0 and wp % 2 == 0, (hp, wp)
    s2d = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)
    w8 = jnp.pad(w7, [(0, 1), (0, 1), (0, 0), (0, 0)])
    w4 = w8.reshape(4, 2, 4, 2, *w7.shape[2:])
    w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, w7.shape[3])
    return layers.conv2d(s2d, w4, compute_dtype=compute_dtype)


@partial(jax.jit, static_argnames=("arch", "use_cube_pad", "compute_dtype",
                                   "with_logits", "stem_s2d",
                                   "cube_conv_form"))
def resnet_apply(
    params: dict,
    x: jax.Array,
    arch: str = "resnet50",
    use_cube_pad: bool = True,
    compute_dtype=jnp.bfloat16,
    with_logits: bool = True,
    stem_s2d: Optional[bool] = None,
    cube_conv_form: Optional[str] = None,
) -> Tuple[Optional[jax.Array], jax.Array]:
    """Forward pass.

    Args:
      params: nested dict (see ``init_resnet_params`` / compat converter).
      x: [N, 6, H, W, 3] cube faces (B D F L R T) or [N*6, H, W, 3].
      compute_dtype: conv compute precision (bf16 on TPU; f32 for parity
        tests).

    Returns:
      (logits [N*6, num_classes] or None, layer4 features [N*6, h, w, Cf]).
    """
    kind, depths = ARCHS[arch]
    block = _bottleneck if kind == "bottleneck" else _basic_block
    if cube_conv_form is None:
        from cp360_tpu.ops.cube_pad import CUBE_CONV_FORM

        # default: 'halo' under bf16 compute (measured on-chip r5: the full
        # fused stage-1 graph runs 758.7 -> 848.7 fps, tools/
        # bench_cube_conv.py — the 16 bottleneck pad materializations were
        # ~2.2 ms/batch), 'pad' under f32 where golden parity is bit-tight
        # (halo reassociates the border ring's sum).
        cube_conv_form = CUBE_CONV_FORM or (
            "pad" if compute_dtype in (None, jnp.float32) else "halo")

    if x.ndim == 5:
        x = x.reshape(-1, *x.shape[2:])

    # Cast ONCE at trunk entry: with bf16 compute every activation
    # (pads, BN, relu, residual adds) stays bf16 — measured r4, the old
    # per-conv cast-back-to-f32 ran the trunk's elementwise traffic at
    # double bandwidth (tools/profile_stage1.py).  f32 compute (the CPU
    # parity path) is unchanged: the cast is a no-op there.
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if stem_s2d is None:
        # measured r4 (same-process A/B, v5e, 16-frame batches): the s2d
        # stem is SLOWER here — zero-padded backbone 20.8 ms vs 16.7, cube-
        # padded 24.3 vs 23.0 (the parity-split reshape/transpose of the
        # full-res input costs more than the C=3 lane waste it removes; XLA
        # handles low-C stems well on this libtpu).  Kept as an opt-in for
        # other toolchains; it also re-orders f32 summation (~2e-4 drift).
        stem_s2d = False
    out = _pad(x, 3, use_cube_pad)
    if stem_s2d and out.shape[1] % 2 == 0 and out.shape[2] % 2 == 0:
        out = _stem_space_to_depth(out, params["conv1"]["w"], compute_dtype)
    else:
        out = layers.conv2d(out, params["conv1"]["w"], stride=2,
                            compute_dtype=compute_dtype)
    out = layers.batch_norm(out, params["bn1"])
    out = jax.nn.relu(out)
    if use_cube_pad and out.shape[1] == out.shape[2] and out.shape[1] % 2 == 0:
        # fused pad+pool: exact (max is grouping-insensitive) and skips
        # materializing the padded 114x114 tensor — the pad at stem-pool
        # resolution was the single largest cube-padding cost (measured
        # r5: 7.67 -> ~4 ms of the 22 ms batch, tools/profile_backbone.py)
        from cp360_tpu.ops.cube_pad import cube_pad_max_pool_3x3s2

        out = cube_pad_max_pool_3x3s2(
            out.reshape(-1, 6, *out.shape[1:]))
        out = out.reshape(-1, *out.shape[2:])
    else:
        out = _pad(out, 1, use_cube_pad)
        out = layers.max_pool(out, 3, 2)

    for li, depth in enumerate(depths):
        stage = params[f"layer{li + 1}"]
        for bi in range(depth):
            stride = 2 if (li > 0 and bi == 0) else 1
            if kind == "bottleneck":
                out = block(stage[bi], out, stride, use_cube_pad,
                            compute_dtype, conv_form=cube_conv_form)
            else:
                out = block(stage[bi], out, stride, use_cube_pad,
                            compute_dtype)

    feats = out  # layer4 output — the CAM feature map
    if not with_logits:
        return None, feats
    pooled = layers.avg_pool(out, 7)
    pooled = pooled.reshape(pooled.shape[0], -1)
    logits = layers.linear(pooled, params["fc"])
    return logits, feats


def init_resnet_params(
    key: jax.Array, arch: str = "resnet50", num_classes: int = 1000, dtype=jnp.float32
) -> dict:
    """He-initialized parameters (reference init: model/resnet_cubic.py:137-143)."""
    kind, depths = ARCHS[arch]
    exp = _EXPANSION[kind]
    keys = iter(jax.random.split(key, 4 + sum(depths) * 4 + 8))

    params = {
        "conv1": {"w": layers.he_conv(next(keys), 7, 7, 3, 64, dtype)},
        "bn1": layers.bn_params(64, dtype),
    }
    inplanes = 64
    for li, depth in enumerate(depths):
        planes = 64 * (2**li)
        stage = []
        for bi in range(depth):
            stride = 2 if (li > 0 and bi == 0) else 1
            blk = {}
            if kind == "bottleneck":
                blk["conv1"] = {"w": layers.he_conv(next(keys), 1, 1, inplanes, planes, dtype)}
                blk["bn1"] = layers.bn_params(planes, dtype)
                blk["conv2"] = {"w": layers.he_conv(next(keys), 3, 3, planes, planes, dtype)}
                blk["bn2"] = layers.bn_params(planes, dtype)
                blk["conv3"] = {"w": layers.he_conv(next(keys), 1, 1, planes, planes * exp, dtype)}
                blk["bn3"] = layers.bn_params(planes * exp, dtype)
            else:
                blk["conv1"] = {"w": layers.he_conv(next(keys), 3, 3, inplanes, planes, dtype)}
                blk["bn1"] = layers.bn_params(planes, dtype)
                blk["conv2"] = {"w": layers.he_conv(next(keys), 3, 3, planes, planes, dtype)}
                blk["bn2"] = layers.bn_params(planes, dtype)
            if stride != 1 or inplanes != planes * exp:
                blk["downsample"] = {
                    "conv": {"w": layers.he_conv(next(keys), 1, 1, inplanes, planes * exp, dtype)},
                    "bn": layers.bn_params(planes * exp, dtype),
                }
            stage.append(blk)
            inplanes = planes * exp
        params[f"layer{li + 1}"] = stage

    k = next(keys)
    params["fc"] = {
        "w": jax.random.normal(k, (512 * exp, num_classes), dtype) * 0.01,
        "b": jnp.zeros((num_classes,), dtype),
    }
    return params
