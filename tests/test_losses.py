"""Weak-supervision losses vs an independent torch implementation of the
reference formulas (temporal_model/train_temporal.py:103-167)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.train.losses import (
    flow_warp_grid,
    total_loss,
    weak_supervision_losses,
    window_normalize,
)


def torch_reference_losses(preds, flows, mm_th, flow_h):
    """Reference loss math, written directly from the spec in torch."""
    import torch
    import torch.nn.functional as F

    p1, b, ph, pw = preds.shape
    n_pairs = p1 - 1
    fh, fw = flows.shape[2], flows.shape[3]
    fscale = flow_h / float(fw)

    # generate_meshgrid (train_temporal.py:25-31)
    y = torch.arange(0, fh).unsqueeze(1).repeat(1, fw) / (fh - 1) * 2 - 1
    x = torch.arange(0, fw).unsqueeze(0).repeat(fh, 1) / (fw - 1) * 2 - 1
    mesh = torch.stack([x, y], 0).unsqueeze(0).float().permute(0, 2, 3, 1)

    loss_sm = loss_temp = loss_mask = 0.0
    for ib in range(b):
        for t in range(n_pairs):
            fl = torch.from_numpy(flows[t, ib].copy()).float() * fscale
            mask = torch.sqrt(fl[:, :, 0] ** 2 + fl[:, :, 1] ** 2) < mm_th

            cur = F.interpolate(
                torch.from_numpy(preds[t, ib][None, None].copy()),
                size=(fh, fw), mode="bilinear", align_corners=True,
            )
            nxt = F.interpolate(
                torch.from_numpy(preds[t + 1, ib][None, None].copy()),
                size=(fh, fw), mode="bilinear", align_corners=True,
            )
            fl = fl.clone()
            fl[:, :, 0] = fl[:, :, 0] / cur.size(3) * 2
            fl[:, :, 1] = fl[:, :, 1] / cur.size(2) * 2
            grid = fl[None] + mesh
            warp = F.grid_sample(cur, grid, align_corners=True)

            masked = nxt.clone()
            masked[:, :, mask] = 0

            loss_sm += torch.sum((nxt - warp) ** 2).item()
            loss_temp += torch.sum((nxt - cur) ** 2).item()
            loss_mask += torch.sum((nxt - masked) ** 2).item()
    return loss_sm, loss_temp, loss_mask


@pytest.fixture(scope="module")
def case():
    rng = np.random.RandomState(0)
    preds = rng.rand(4, 2, 6, 12).astype(np.float32)
    flows = (rng.randn(3, 2, 16, 32, 2) * 2).astype(np.float32)
    return preds, flows


def test_losses_match_torch_reference(case):
    preds, flows = case
    got = weak_supervision_losses(
        jnp.asarray(preds), jnp.asarray(flows), mm_th=0.15, flow_h=16
    )
    want_sm, want_temp, want_mask = torch_reference_losses(preds, flows, 0.15, 16)
    assert float(got["smooth"]) == pytest.approx(want_sm, rel=1e-4)
    assert float(got["temporal"]) == pytest.approx(want_temp, rel=1e-4)
    assert float(got["mask"]) == pytest.approx(want_mask, rel=1e-4)


def test_total_loss_weights(case):
    preds, flows = case
    parts = weak_supervision_losses(jnp.asarray(preds), jnp.asarray(flows), 0.15, 16)
    tot = total_loss(parts, 0.7, 1.0, 0.01)
    want = 0.7 * parts["smooth"] + 1.0 * parts["temporal"] + 0.01 * parts["mask"]
    assert float(tot) == pytest.approx(float(want))


def test_gradient_only_through_next(case):
    # The reference detaches warp/current/masked targets
    # (train_temporal.py:145-151): with only one pair, d loss / d p_t must be 0
    # and d loss / d p_{t+1} nonzero.
    preds, flows = case
    preds2 = preds[:2]
    flows2 = flows[:1]

    def f(p):
        parts = weak_supervision_losses(p, jnp.asarray(flows2), 0.15, 16)
        return total_loss(parts, 0.7, 1.0, 0.01)

    g = jax.grad(f)(jnp.asarray(preds2))
    assert float(jnp.abs(g[0]).max()) == 0.0
    assert float(jnp.abs(g[1]).max()) > 0.0


def test_window_normalize():
    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.randn(5, 6, 7, 7, 3).astype(np.float32) * 3 + 1)
    norm, mn, rg = window_normalize(seq)
    assert float(jnp.min(norm)) == pytest.approx(0.0, abs=1e-6)
    assert float(jnp.max(norm)) == pytest.approx(1.0, abs=1e-6)


def test_flow_warp_grid_zero_flow_is_identity():
    flow = jnp.zeros((1, 8, 10, 2))
    grid = flow_warp_grid(flow)
    from cp360_tpu.ops.resample import grid_sample

    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 10, 1).astype(np.float32))
    y = grid_sample(x, grid)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
