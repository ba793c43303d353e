"""Weakly-supervised training losses (pure JAX, batched, differentiable).

Reference: temporal_model/train_temporal.py:103-167.  Three sum-MSE losses
over consecutive pairs of equirectangular saliency predictions, upsampled to
flow resolution:

- smooth (flow-warp): || p_{t+1} - stopgrad(warp(p_t, flow_t)) ||^2
- temporal:           || p_{t+1} - stopgrad(p_t) ||^2
- motion-mask:        || p_{t+1} - stopgrad(p_{t+1} with static pixels
                         zeroed) ||^2   (static = |flow| < mm_th)

Reference quirks reproduced:
- the flow is scaled by fscale = flow_h / flow_width = 0.5 before use
  (train_temporal.py:110-112 — with the shipped 480x960 flows, the "resize"
  is a no-op and only this scaling survives);
- the warp grid normalizes dx by width/2 and dy by height/2 in the
  align_corners=True convention (train_temporal.py:136-138, 25-31);
- grads flow ONLY through p_{t+1}: warp, current, and the masked target are
  all detached (train_temporal.py:145-151);
- losses are summed (MSELoss(size_average=False), train_temporal.py:252)
  over pairs, batch, and pixels;
- total = l_s * smooth + l_t * temporal + l_m * mask (train_temporal.py:167).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cp360_tpu.ops.resample import resize_bilinear, warp_upsampled


def flow_warp_grid(flow: jax.Array) -> jax.Array:
    """Flow [B, H, W, 2] (dx, dy in pixels at HxW) -> grid_sample grid.

    Matches generate_meshgrid + the normalization in the reference
    (train_temporal.py:25-31,136-138): base grid in [-1, 1] (align-corners)
    plus flow scaled by 2/width (x) and 2/height (y).
    """
    b, h, w, _ = flow.shape
    ys = jnp.arange(h, dtype=jnp.float32) / (h - 1) * 2 - 1
    xs = jnp.arange(w, dtype=jnp.float32) / (w - 1) * 2 - 1
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    base = jnp.stack([gx, gy], axis=-1)[None]
    off = jnp.stack([flow[..., 0] / w * 2.0, flow[..., 1] / h * 2.0], axis=-1)
    return base + off


def weak_supervision_losses(
    preds: jax.Array,
    flows: jax.Array,
    mm_th: float = 0.15,
    flow_h: int = 480,
) -> Dict[str, jax.Array]:
    """Compute the three losses.

    Args:
      preds: [P+1, B, h, w] channel-maxed equi predictions for consecutive
        steps (P pairs; reference: tmp_loss_len=3 pairs from the last 4
        steps, train_temporal.py:34,104).
      flows: [P, B, H, W, 2] raw optical flow for each pair, at the stored
        resolution (H = flow_h, W = 2*flow_h in the shipped pipeline).
      mm_th: motion-mask threshold on the *scaled* flow magnitude
        (config.yaml:41).

    Returns dict with 'smooth', 'temporal', 'mask' (sum-MSE scalars).
    """
    p1, b, _, _ = preds.shape
    p = p1 - 1
    fh, fw = flows.shape[2], flows.shape[3]
    fscale = flow_h / float(fw)  # reference train_temporal.py:110
    f = flows * fscale

    cur_lo = preds[:-1].reshape(p * b, *preds.shape[2:])
    cur = resize_bilinear(cur_lo[..., None], fh, fw)  # torch-0.3 upsample
    nxt = resize_bilinear(preds[1:].reshape(p * b, *preds.shape[2:])[..., None], fh, fw)

    f2 = f.reshape(p * b, fh, fw, 2)
    grid = flow_warp_grid(f2)
    # == grid_sample(cur, grid) exactly, but gather-free (TPU: the 4-corner
    # gather at flow resolution was 65% of the whole train step).
    warp = warp_upsampled(cur_lo, grid)[..., None]

    mag = jnp.sqrt(f2[..., 0] ** 2 + f2[..., 1] ** 2)
    static = (mag < mm_th)[..., None]
    nxt_masked = jnp.where(static, 0.0, nxt)

    loss_sm = jnp.sum((nxt - jax.lax.stop_gradient(warp)) ** 2)
    loss_temp = jnp.sum((nxt - jax.lax.stop_gradient(cur)) ** 2)
    loss_mask = jnp.sum((nxt - jax.lax.stop_gradient(nxt_masked)) ** 2)
    return {"smooth": loss_sm, "temporal": loss_temp, "mask": loss_mask}


def total_loss(losses: Dict[str, jax.Array], l_s: float, l_t: float, l_m: float) -> jax.Array:
    return l_s * losses["smooth"] + l_t * losses["temporal"] + l_m * losses["mask"]


def window_normalize(seq: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Joint min/max normalization over a whole window/sequence.

    Reference: the test protocol (test_temporal.py:66-71) and the training
    intra-sequence normalization (train_temporal.py:76-90) both normalize by
    the global min and (max - min) of the entire window.

    Args:
      seq: [..., any] — normalized over ALL axes except axis 0 is included
        too (global scalar min/max), matching the reference.

    Returns (normalized seq, min, max-min).
    """
    mn = jnp.min(seq)
    rng = jnp.max(seq - mn)
    return (seq - mn) / rng, mn, rng
